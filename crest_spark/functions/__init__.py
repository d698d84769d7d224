from crest_spark.functions.stable import avg4, round4, sum4
from crest_spark.functions.vectors import cosine_sim, dot, l2_norm

__all__ = ["avg4", "round4", "sum4", "cosine_sim", "dot", "l2_norm"]
