from .explain import executed_plan, has_broadcast_join, has_python_eval, pushed_filters

__all__ = ["executed_plan", "has_broadcast_join", "has_python_eval", "pushed_filters"]
