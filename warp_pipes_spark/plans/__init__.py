from warp_pipes_spark.plans.layout import ZOrderLayout, zorder_key
from warp_pipes_spark.plans.skew import salted_join, salted_collect_list

__all__ = ["salted_join", "salted_collect_list", "ZOrderLayout", "zorder_key"]
