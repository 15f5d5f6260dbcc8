from sql_to_dbsp_compiler_spark.plans.zset import ZSet

__all__ = ["ZSet"]
