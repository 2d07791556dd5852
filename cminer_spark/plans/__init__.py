from cminer_spark.plans.checkpoint import SuperstepCheckpoint

__all__ = ["SuperstepCheckpoint"]
