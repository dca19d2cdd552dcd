"""Plan inspection + lineage helpers."""

from .lineage import explain_text, partition_histogram, plan_checks  # noqa: F401
