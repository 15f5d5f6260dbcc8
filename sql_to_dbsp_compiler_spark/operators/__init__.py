"""Composable DataFrame→DataFrame relational operators.

These are the Spark realizations of the reference's circuit operator
vocabulary (reference: circuit/operator/*.java). Plain views should
use the DataFrame API directly and let Catalyst fuse; the helpers here
capture the non-trivial shapes (per-group topK, decimal-exact money
aggregation, semi/anti joins with broadcast hints).
"""

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2, money_avg, money_sum
from sql_to_dbsp_compiler_spark.operators.joins import anti_join, dim_join, semi_join
from sql_to_dbsp_compiler_spark.operators.topk import topk_global, topk_per_group

__all__ = [
    "anti_join",
    "dec2",
    "dim_join",
    "money_avg",
    "money_sum",
    "semi_join",
    "topk_global",
    "topk_per_group",
]
