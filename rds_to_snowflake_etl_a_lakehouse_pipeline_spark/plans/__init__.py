"""Pipeline layer: medallion transforms, DQ gates, DAG runner."""

from .dq import DQResult, DQRule, evaluate_now  # noqa: F401
from .runner import Node, Pipeline  # noqa: F401
