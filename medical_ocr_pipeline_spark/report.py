"""HTML QA report for an extraction run.

The reference emits per-run visual QA artifacts — overlay images,
coverage heatmaps, and an HTML evaluation report
(notebooks/02_ocr_verifier.py:157-182,265-302,
qa_pipeline_evaluator.py:819-865).  This module is the engine's
equivalent: one self-contained HTML file rendered from a finished run
directory's stage tables (01_extracted, 02_conversations, metrics).

Scale shape: every number in the report is a combinable Spark aggregate
collected as a tiny frame (variant counts <= #variants, confidence
histogram <= 11 buckets, stage metrics one row per (run, stage),
partition lineage top-K) — the report path never collects row-level
data, so it renders identically from a 500-turn smoke run or a
10^12-turn production table.

Rendering is pure stdlib (f-string HTML + hand-built SVG): no plotting
or templating dependency.  Charts follow the engine's dataviz rules —
single-hue bars for single-measure magnitude, direct value labels in
text ink (never series-colored text), native <title> hover tooltips,
and an adjacent table view for every chart.
"""

from __future__ import annotations

import html as _html
import os

from pyspark.sql import functions as F

# light-surface palette (validated categorical slot 1 + text tokens)
_SURFACE = "#fcfcfb"
_INK = "#0b0b0b"
_INK2 = "#52514e"
_BAR = "#2a78d6"
_GRID = "#e7e6e2"


def _esc(v) -> str:
    return _html.escape(str(v))


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:,.3f}".rstrip("0").rstrip(".")
    if isinstance(v, int):
        return f"{v:,}"
    return _esc(v)


def _bar_svg(rows, width=660, bar_h=20, gap=6, label_w=150, val_w=90):
    """Horizontal bar chart: [(label, value, hover)] -> SVG string.
    Bars anchor at the baseline (left) with a 4px-rounded data end;
    value labels sit beside the data end in secondary ink."""
    if not rows:
        return ""
    mx = max(v for _, v, _ in rows) or 1
    plot_w = width - label_w - val_w
    h = len(rows) * (bar_h + gap) + gap
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" role="img" '
        f'width="{width}" height="{h}" '
        f'viewBox="0 0 {width} {h}" '
        f'style="font:12px system-ui,sans-serif;background:{_SURFACE}">'
    ]
    r = 4
    for i, (label, value, hover) in enumerate(rows):
        y = gap + i * (bar_h + gap)
        w = max(1, round(plot_w * value / mx))
        cy = y + bar_h / 2 + 4
        if w > r:
            bar = (
                f'M {label_w} {y} h {w - r} q {r} 0 {r} {r} '
                f'v {bar_h - 2 * r} q 0 {r} -{r} {r} h -{w - r} z'
            )
            shape = f'<path d="{bar}" fill="{_BAR}">'
        else:
            shape = (
                f'<rect x="{label_w}" y="{y}" width="{w}" '
                f'height="{bar_h}" fill="{_BAR}">'
            )
        parts.append(
            f'<text x="{label_w - 8}" y="{cy}" text-anchor="end" '
            f'fill="{_INK}">{_esc(label)}</text>'
            f'{shape}<title>{_esc(hover)}</title>'
            f'{"</path>" if w > r else "</rect>"}'
            f'<text x="{label_w + w + 6}" y="{cy}" fill="{_INK2}">'
            f'{_fmt(value)}</text>'
        )
    parts.append(
        f'<line x1="{label_w}" y1="{gap / 2}" x2="{label_w}" '
        f'y2="{h - gap / 2}" stroke="{_GRID}" stroke-width="1"/></svg>'
    )
    return "".join(parts)


def _table(headers, rows) -> str:
    th = "".join(f"<th>{_esc(c)}</th>" for c in headers)
    trs = "".join(
        "<tr>" + "".join(f"<td>{_fmt(v)}</td>" for v in r) + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{th}</tr></thead><tbody>{trs}</tbody></table>"


def _tile(label, value) -> str:
    return (
        f'<div class="tile"><div class="v">{_fmt(value)}</div>'
        f'<div class="l">{_esc(label)}</div></div>'
    )


def qa_report_data(spark, run_dir: str) -> dict:
    """Collect the report's aggregates from a run directory.  Every
    collect() here is a bounded frame (buckets / variants / stages /
    top-K partitions), never row-level data."""
    ex = spark.read.parquet(f"{run_dir}/01_extracted")
    out: dict = {}
    tot = ex.agg(
        F.count("*").alias("turns"),
        F.countDistinct("conv_id").alias("convs"),
        F.sum("parse_failures").cast("long").alias("parse_failures"),
        F.sum("bytes_stripped").cast("long").alias("bytes_stripped"),
        F.avg("mean_conf").alias("mean_conf"),
        F.sum(F.col("two_col").cast("long")).alias("two_col_turns"),
        F.sum("n_header").cast("long").alias("header_blocks"),
        F.sum("n_footer").cast("long").alias("footer_blocks"),
    ).collect()[0]
    out["totals"] = tot.asDict()
    out["variants"] = [
        (r["variant"], r["n"])
        for r in ex.groupBy("variant")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "variant")
        .collect()
    ]
    out["conf_hist"] = [
        (r["b"], r["n"])
        for r in ex.select(
            (F.floor(F.col("mean_conf") * 10) / 10).alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .orderBy("b")
        .collect()
    ]
    # per-partition lineage skew view: top-8 + the median, from metrics
    mpath = f"{run_dir}/metrics"
    out["stages"] = []
    out["partitions"] = []
    if os.path.exists(mpath):
        m = spark.read.parquet(mpath)
        out["stages"] = [
            r.asDict()
            for r in m.groupBy("run_id", "stage")
            .agg(
                F.count("*").alias("partitions"),
                F.sum("turns_processed").cast("long").alias("turns"),
                F.sum("parse_failures").cast("long").alias("parse_failures"),
                F.round(F.avg("avg_conf"), 4).alias("avg_conf"),
            )
            .orderBy("run_id", "stage")
            .collect()
        ]
        out["partitions"] = [
            r.asDict()
            for r in m.select("partition_id", "turns_processed")
            .orderBy(F.desc("turns_processed"), "partition_id")
            .limit(8)
            .collect()
        ]
        med = m.agg(
            F.expr("percentile(turns_processed, 0.5)").alias("med")
        ).collect()[0]["med"]
        out["partition_median"] = float(med or 0)
    cpath = f"{run_dir}/02_conversations"
    out["conv_hist"] = []
    if os.path.exists(cpath):
        conv = spark.read.parquet(cpath)
        buckets = (
            F.when(F.col("n_turns") <= 2, "1-2")
            .when(F.col("n_turns") <= 5, "3-5")
            .when(F.col("n_turns") <= 10, "6-10")
            .otherwise("11+")
        )
        out["conv_hist"] = [
            (r["b"], r["n"])
            for r in conv.select(buckets.alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        order = {"1-2": 0, "3-5": 1, "6-10": 2, "11+": 3}
        out["conv_hist"].sort(key=lambda t: order.get(t[0], 9))
    return out


def render_qa_report(spark, run_dir: str, out_path: str | None = None) -> str:
    """Render the QA report HTML for a finished run directory; returns
    the written path (default <run_dir>/qa_report.html)."""
    d = qa_report_data(spark, run_dir)
    t = d["totals"]
    fail_ppm = (
        1_000_000 * int(t["parse_failures"] or 0) // max(1, int(t["turns"]))
    )
    tiles = "".join(
        _tile(k, v)
        for k, v in [
            ("turns extracted", int(t["turns"])),
            ("conversations", int(t["convs"])),
            ("parse failures (ppm)", fail_ppm),
            ("bytes stripped", int(t["bytes_stripped"] or 0)),
            ("mean confidence", round(float(t["mean_conf"] or 0), 4)),
            ("two-column turns", int(t["two_col_turns"] or 0)),
        ]
    )
    variant_rows = [
        (v, n, f"{v}: {n} turns") for v, n in d["variants"]
    ]
    conf_rows = [
        (f"{b:.1f}-{b + 0.1:.1f}", n, f"mean_conf in [{b:.1f}, {b + 0.1:.1f}): {n} turns")
        for b, n in d["conf_hist"]
    ]
    conv_rows = [
        (b, n, f"{n} conversations with {b} turns") for b, n in d["conv_hist"]
    ]
    sections = [
        "<h2>Engine variants</h2>",
        _bar_svg(variant_rows),
        "<h2>Turn confidence distribution</h2>",
        _bar_svg(conf_rows),
    ]
    if conv_rows:
        sections += ["<h2>Conversation sizes</h2>", _bar_svg(conv_rows)]
    if d["stages"]:
        sections += [
            "<h2>Stage metrics</h2>",
            _table(
                ["run_id", "stage", "partitions", "turns",
                 "parse_failures", "avg_conf"],
                [
                    (s["run_id"], s["stage"], s["partitions"], s["turns"],
                     s["parse_failures"], s["avg_conf"])
                    for s in d["stages"]
                ],
            ),
        ]
    if d["partitions"]:
        med = d.get("partition_median", 0) or 1
        hottest = d["partitions"][0]["turns_processed"]
        sections += [
            "<h2>Partition lineage (top 8 by turns)</h2>",
            f'<p class="note">hottest/median partition ratio: '
            f"{hottest / med:.2f}&times;</p>",
            _table(
                ["partition_id", "turns_processed"],
                [
                    (p["partition_id"], p["turns_processed"])
                    for p in d["partitions"]
                ],
            ),
        ]
    body = "\n".join(sections)
    html_doc = f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>Extraction QA report</title>
<style>
body {{ background:{_SURFACE}; color:{_INK};
       font:14px system-ui,sans-serif; margin:2rem auto; max-width:760px; }}
h1 {{ font-size:1.3rem; }} h2 {{ font-size:1.05rem; margin-top:1.6rem; }}
.tiles {{ display:flex; flex-wrap:wrap; gap:12px; }}
.tile {{ border:1px solid {_GRID}; border-radius:8px; padding:10px 14px; }}
.tile .v {{ font-size:1.35rem; font-weight:600; }}
.tile .l {{ color:{_INK2}; font-size:0.8rem; }}
table {{ border-collapse:collapse; margin-top:0.5rem; }}
th, td {{ border-bottom:1px solid {_GRID}; padding:4px 12px 4px 0;
          text-align:left; font-variant-numeric:tabular-nums; }}
th {{ color:{_INK2}; font-weight:600; }}
.note {{ color:{_INK2}; }}
</style></head><body>
<h1>Extraction QA report</h1>
<p class="note">run directory: {_esc(run_dir)}</p>
<div class="tiles">{tiles}</div>
{body}
</body></html>
"""
    path = out_path or os.path.join(run_dir, "qa_report.html")
    with open(path, "w", encoding="utf-8") as f:
        f.write(html_doc)
    return path
