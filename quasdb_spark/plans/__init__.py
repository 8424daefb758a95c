from quasdb_spark.plans.lww import state_view, state_view_window
from quasdb_spark.plans.parallel import ensure_parallelism
from quasdb_spark.plans.skew import salted_join

__all__ = ["state_view", "state_view_window", "ensure_parallelism",
           "salted_join"]
