"""Design constants carried over from the reference pipeline.

Every value here preserves a reference default so that golden fixtures
are reproducible (see SURVEY.md §7.0).  Citations point at the reference
repo (/root/reference) file:line where the constant originates.
"""

# --- confidence / filtering -------------------------------------------------
# notebooks/01_extract_blocks.ipynb cell 1:46  (min_conf)
MIN_CONF = 0.50
# notebooks/01b_normalize_layout.ipynb cell 0:37  (MIN_TEXT_LEN)
MIN_TEXT_LEN = 2
# notebooks/01_extract_blocks.ipynb cell 1:45  (native_len_gate)
NATIVE_LEN_GATE = 100

# --- line / paragraph grouping ----------------------------------------------
# notebooks/01_extract_blocks.ipynb cell 1:47 — regroup-level line join
LINE_JOIN_PX = 14.0
# mcp/mcp_ocr_tesseract.py:36-79 — engine-internal word->line grouping 10px
ENGINE_LINE_JOIN_PX = 10.0
# notebooks/01_extract_blocks.ipynb cell 1:47-48 — line->paragraph while
# (cur.y0 - prev.y1) <= 26px
PARA_JOIN_PX = 26.0
# notebooks/02a_segment_general.ipynb cell 0:31 — segmentation gap
SEGMENT_GAP_Y = 18.0

# --- adaptive row merge (01b) -----------------------------------------------
# notebooks/01b_normalize_layout.ipynb cell 0:156-160
BASE_LINE_MERGE_TOL_Y = 0.60   # × median block height, min 4px
MIN_TOL_Y = 4.0
BASE_LINE_MERGE_TOL_X = 0.90   # × median block height, min 10px
MIN_TOL_X = 10.0

# --- spatial dedup (J1) -----------------------------------------------------
# notebooks/01_extract_blocks.ipynb cell 4:374-386
DEDUP_IOU_THR = 0.50
DEDUP_SIM_THR = 0.92
IOU_EPS = 1e-6

# --- section classifier (P7) ------------------------------------------------
# notebooks/01_extract_blocks.ipynb cell 4:106-110 — center-y thresholds
HEADER_FRAC = 0.25
FOOTER_FRAC = 0.85

# --- header/footer adaptive bands (P6) --------------------------------------
# notebooks/01b_normalize_layout.ipynb cell 0:67-71
HEAD_BAND_MAX_PX = 140.0
FOOT_BAND_MAX_PX = 120.0
# 01b cell 0:67-71: header band min(0.10*H, 140), footer min(0.08*H, 120)
HEAD_BAND_FRAC = 0.10
FOOT_BAND_FRAC = 0.08

# --- fuzzy dictionary correction (J3) ---------------------------------------
# notebooks/02_cleanup_blocks.ipynb cell 4:52-71
FUZZY_CUTOFF = 0.86
MAX_CORRECTIONS = 200
FUZZY_MIN_TOKEN_LEN = 4

# --- chunking (W7) ----------------------------------------------------------
# notebooks/04_json_extraction.ipynb cell 2:186-187
CHUNK_CHAR_BUDGET = 90_000
CHUNK_EST_OVERHEAD = 180

# --- synthetic page geometry (used by the deterministic generator) ----------
PAGE_W = 1000.0
PAGE_H = 1400.0

# --- two-column detection (A8) ----------------------------------------------
# notebooks/01b_normalize_layout.ipynb cell 0:121-146
TWO_COL_MIN_SEP_FRAC = 0.12
TWO_COL_KMEANS_ITERS = 8

# --- dictionary corrections (config/medical_terms.yml:1-9 +
#     notebooks/02_domain_cleanup.ipynb cell 0:63-74 builtins) ---------------
DICTIONARY = {
    "toabeculas": "trabeculae",
    "necrosls": "necrosis",
    "tumour": "tumor",
    "metastasls": "metastasis",
    "lnfiltrate": "infiltrate",
    "calclfication": "calcification",
    "flbrosis": "fibrosis",
    "lnflammation": "inflammation",
    "carclnoma": "carcinoma",
}

# seed vocab for fuzzy matching (02_domain_cleanup cell 0:82-87 pattern:
# VOCAB = set(dict.values()) | seed terms)
VOCAB_SEED = [
    "diagnosis", "impression", "prescription", "radiology",
    "patient", "doctor", "medication", "dosage", "biopsy",
]

STOPWORDS = {
    "the", "and", "with", "from", "this", "that", "have", "been",
    "were", "will", "into", "over", "under", "than", "then",
}

# tokens never fuzzy-corrected (02_cleanup_blocks cell 4:25-27)
DO_NOT_TOUCH = {"mg", "ml", "mcg", "bid", "tid", "qid", "prn"}
