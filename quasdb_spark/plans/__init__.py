from quasdb_spark.plans.lww import state_view, state_view_window

__all__ = ["state_view", "state_view_window"]
