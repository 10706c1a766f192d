"""Pipeline layer: medallion transforms, DQ gates, DAG runner."""

from .dq import (  # noqa: F401
    DQResult,
    DQRule,
    evaluate_now,
    quarantine_split,
)
from .runner import Node, Pipeline  # noqa: F401
