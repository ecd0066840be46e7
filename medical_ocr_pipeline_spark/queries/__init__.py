"""Query registry package: importing this module registers every query."""

from medical_ocr_pipeline_spark.queries import (  # noqa: F401
    dedup,
    extraction,
    misc,
    qa,
    relational,
    similarity,
    temporal,
    textstats,
)
from medical_ocr_pipeline_spark.queries.base import REGISTRY  # noqa: F401
