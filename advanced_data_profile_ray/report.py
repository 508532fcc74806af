"""Report emitters: profile.json, verdicts.json, plot-ready data from
sketches, and a minimal self-contained HTML report.

Parity with the reference's report surface (generate_html_report,
Profiler.py:1080-1112 + jinja_template.html): the phase tables become
JSON artifacts; the per-column plot payloads (histogram, box, Q-Q,
cumulative frequency — Profiler.py:735-767) are computed from the merged
t-digest/histogram sketches (quantile reads, SURVEY.md A24/A25 — no
global sort, no raw-row access). HTML is a driver-side post-process, not
a distributed op, exactly like the reference's jinja render.
"""

from __future__ import annotations

import gzip
import html
import json
import math

import numpy as np

from .pipelines.profile import TableProfile, _json_default


def box_plot_data(col) -> dict | None:
    """Five-number summary from the t-digest (A25 box plot)."""
    td = col.tdigest
    if td is None or td.means.size == 0:
        return None
    q1, med, q3 = td.quantile(0.25), td.quantile(0.5), td.quantile(0.75)
    iqr = q3 - q1
    return {
        "min": td.min, "q1": q1, "median": med, "q3": q3, "max": td.max,
        "lower_fence": q1 - 1.5 * iqr, "upper_fence": q3 + 1.5 * iqr,
    }


def qq_plot_data(col, n_points: int = 50) -> dict | None:
    """Ordered sample quantiles vs standard-normal quantiles (A25 Q-Q,
    probplot equivalent) — both axes from sketch reads."""
    td = col.tdigest
    m = col.moments
    if td is None or td.means.size == 0 or m.n < 3:
        return None
    probs = (np.arange(1, n_points + 1) - 0.5) / n_points
    sample_q = [td.quantile(p) for p in probs]
    # inverse normal CDF via Acklam-style rational approximation
    theo_q = [_norm_ppf(p) for p in probs]
    return {"theoretical": theo_q, "sample": sample_q}


def cdf_plot_data(col, n_points: int = 100) -> dict | None:
    """Cumulative frequency curve (A25) from the t-digest."""
    td = col.tdigest
    if td is None or td.means.size == 0:
        return None
    probs = np.linspace(0.0, 1.0, n_points)
    return {"value": [td.quantile(p) for p in probs], "cum_freq": probs.tolist()}


def date_part_plot_data(col) -> dict | None:
    """Six bar-chart series (year/month/day/hour/minute/second counts)
    for temporal columns — the reference's per-component count plots
    (Profiler.py:780-794) as plot-ready payloads."""
    if col.date_parts is None:
        return None
    return {
        part: {"x": list(hist.keys()), "y": list(hist.values())}
        for part, hist in col.date_parts.finalize().items()
    }


def wordcloud_payload(freqs, max_words: int = 50,
                      min_size: int = 12, max_size: int = 64) -> list:
    """Word-cloud payload from a (word, n) frequency frame — the
    renderable stand-in for the reference's WordCloud image
    (Profiler.py:813-850; the wordcloud lib is absent here, so the
    payload carries (word, count, font size) for any front-end)."""
    rows = freqs.head(max_words)
    if len(rows) == 0:
        return []
    n = rows["n"].to_numpy(dtype=np.float64)
    lo, hi = float(n.min()), float(n.max())
    span = (hi - lo) or 1.0
    sizes = min_size + (max_size - min_size) * (n - lo) / span
    return [
        {"word": w, "count": int(c), "size": round(float(s), 1)}
        for w, c, s in zip(rows["word"], rows["n"], sizes)
    ]


def _norm_ppf(p: float) -> float:
    """Standard normal inverse CDF (Peter Acklam's rational approximation,
    max abs error ~1.15e-9 — plenty for plot data)."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p <= 0:
        return -math.inf
    if p >= 1:
        return math.inf
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def hist_plot_data(col) -> dict | None:
    """Fixed-bin histogram payload (A24) straight off the merged sketch."""
    if col.histogram is None:
        return None
    return col.histogram.finalize()


def full_report_dict(profile: TableProfile, verdicts: list | None = None,
                     top_k: int = 10) -> dict:
    out = profile.finalize(top_k)
    for col_dict in out["columns"]:
        col = profile.columns[col_dict["column"]]
        plots = {}
        for name, fn in (("box", box_plot_data), ("qq", qq_plot_data),
                         ("cdf", cdf_plot_data), ("hist", hist_plot_data),
                         ("date_parts", date_part_plot_data)):
            data = fn(col)
            if data is not None:
                plots[name] = data
        if plots:
            col_dict["plots"] = plots
    if verdicts is not None:
        out["verdicts"] = [v.to_dict() for v in verdicts]
    return out


def write_json_report(profile: TableProfile, path: str,
                      verdicts: list | None = None) -> None:
    with open(path, "w") as f:
        json.dump(full_report_dict(profile, verdicts), f, indent=2,
                  default=_json_default)


# --- inline-SVG chart primitives (driver-side render of the plot
# payloads the distributed pass already computed — the engine-appropriate
# closing of the reference's plotly/jinja chart gap, Profiler.py:735-794:
# O(columns) strings, zero chart libraries, self-contained document) ---

_SVG_W, _SVG_H, _SVG_PAD = 320, 120, 22


def _svg_open(title: str) -> str:
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{_SVG_W}" '
            f'height="{_SVG_H + _SVG_PAD}" font-family="sans-serif">'
            f'<text x="4" y="12" font-size="11">{html.escape(title)}</text>')


def _svg_bars(labels: list, ys: list, title: str) -> str:
    """Bar chart; labels printed on first/last bars only (axis-lite)."""
    if not ys or max(ys) <= 0:
        return ""
    n = len(ys)
    top = float(max(ys))
    bw = max(1.0, (_SVG_W - 8) / n - 1)
    parts = [_svg_open(title)]
    for i, y in enumerate(ys):
        h = (float(y) / top) * (_SVG_H - 10)
        x = 4 + i * ((_SVG_W - 8) / n)
        parts.append(f'<rect x="{x:.1f}" y="{_SVG_PAD + _SVG_H - 10 - h:.1f}" '
                     f'width="{bw:.1f}" height="{h:.1f}" fill="#4878a8"/>')
    for i in (0, n - 1):
        x = 4 + i * ((_SVG_W - 8) / n)
        parts.append(f'<text x="{x:.1f}" y="{_SVG_PAD + _SVG_H + 2:.0f}" '
                     f'font-size="9">{html.escape(str(labels[i]))}</text>')
    parts.append("</svg>")
    return "".join(parts)


def _svg_line(xs: list, ys: list, title: str) -> str:
    """Polyline (CDF / Q-Q)."""
    if len(xs) < 2:
        return ""
    fx = [float(v) for v in xs]
    fy = [float(v) for v in ys]
    x0, x1 = min(fx), max(fx)
    y0, y1 = min(fy), max(fy)
    sx = (_SVG_W - 8) / ((x1 - x0) or 1.0)
    sy = (_SVG_H - 10) / ((y1 - y0) or 1.0)
    pts = " ".join(
        f"{4 + (x - x0) * sx:.1f},{_SVG_PAD + _SVG_H - 10 - (y - y0) * sy:.1f}"
        for x, y in zip(fx, fy))
    return (_svg_open(title)
            + f'<polyline points="{pts}" fill="none" stroke="#4878a8" '
              'stroke-width="1.5"/>'
            + f'<text x="4" y="{_SVG_PAD + _SVG_H + 2}" font-size="9">'
              f'[{x0:.4g}, {x1:.4g}] → [{y0:.4g}, {y1:.4g}]</text></svg>')


def _svg_box(b: dict, title: str) -> str:
    """Horizontal box-and-whisker from the five-number summary."""
    lo = min(b["min"], b["lower_fence"])
    hi = max(b["max"], b["upper_fence"])
    s = (_SVG_W - 8) / ((hi - lo) or 1.0)

    def X(v):
        return 4 + (float(v) - lo) * s

    cy = _SVG_PAD + (_SVG_H - 10) / 2
    bh = (_SVG_H - 10) * 0.5
    return (_svg_open(title)
            + f'<line x1="{X(b["min"]):.1f}" x2="{X(b["max"]):.1f}" '
              f'y1="{cy:.1f}" y2="{cy:.1f}" stroke="#888"/>'
            + f'<rect x="{X(b["q1"]):.1f}" y="{cy - bh / 2:.1f}" '
              f'width="{max(1.0, X(b["q3"]) - X(b["q1"])):.1f}" height="{bh:.1f}" '
              'fill="#a8c4e0" stroke="#4878a8"/>'
            + f'<line x1="{X(b["median"]):.1f}" x2="{X(b["median"]):.1f}" '
              f'y1="{cy - bh / 2:.1f}" y2="{cy + bh / 2:.1f}" '
              'stroke="#c04848" stroke-width="2"/>'
            + f'<text x="4" y="{_SVG_PAD + _SVG_H + 2}" font-size="9">'
              f'min {b["min"]:.4g} · q1 {b["q1"]:.4g} · med {b["median"]:.4g} '
              f'· q3 {b["q3"]:.4g} · max {b["max"]:.4g}</text></svg>')


def _svg_wordcloud(payload: list, title: str = "top terms",
                   width: int = 640) -> str:
    """Inline-SVG word cloud from a ``wordcloud_payload`` list — the
    driver-side render of the reference's WordCloud image
    (Profiler.py:813-850) without the wordcloud/matplotlib libraries:
    count-scaled font sizes, deterministic row-wrap layout (biggest terms
    first, left-to-right), self-contained document."""
    if not payload:
        return ""
    rows, cur, cur_w = [], [], 0.0
    for item in payload:
        # ~0.6em average glyph advance for sans-serif
        w = 0.62 * item["size"] * len(item["word"]) + 12
        if cur and cur_w + w > width:
            rows.append(cur)
            cur, cur_w = [], 0.0
        cur.append(item)
        cur_w += w
    if cur:
        rows.append(cur)
    parts, y = [], 16
    body = []
    for row in rows:
        line_h = max(it["size"] for it in row) + 6
        y += line_h
        x = 4
        for it in row:
            shade = 20 + int(60 * (1 - it["size"] / 64))
            body.append(
                f'<text x="{x:.0f}" y="{y}" font-size="{it["size"]}" '
                f'fill="rgb({shade}%,{shade}%,{shade}%)">'
                f'{html.escape(it["word"])}'
                f'<title>{it["count"]}</title></text>'
            )
            x += 0.62 * it["size"] * len(it["word"]) + 12
    parts.append(
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{y + 12}" font-family="sans-serif">'
        f'<text x="4" y="12" font-size="11">{html.escape(title)}</text>'
    )
    parts.extend(body)
    parts.append("</svg>")
    return "".join(parts)


def _svg_heatmap(labels: list, matrix, title: str = "correlation",
                 cell: int = 44) -> str:
    """Inline-SVG correlation heatmap — the driver-side stand-in for
    the reference's plotly corr figure (Profiler.py:1019-1031): one
    shaded cell per (i, j) pair over a symmetric [-1, 1] matrix, blue
    for negative, red for positive, value printed in-cell. ``matrix``
    is any 2-D indexable (numpy array / list of lists) aligned with
    ``labels``."""
    n = len(labels)
    if n == 0:
        return ""
    left = 8 + max(len(str(l)) for l in labels) * 7
    top = 16 + max(len(str(l)) for l in labels) * 4
    w = left + n * cell + 8
    h_tot = top + n * cell + 8
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" '
        f'height="{h_tot + 16}" font-family="sans-serif" font-size="10">'
        f'<text x="4" y="12" font-size="11">{html.escape(title)}</text>'
    ]
    for j, lab in enumerate(labels):
        x = left + j * cell + cell // 2
        parts.append(f'<text x="{x}" y="{top - 4}" text-anchor="middle" '
                     f'font-size="9">{html.escape(str(lab))}</text>')
    for i, lab in enumerate(labels):
        y = top + i * cell + cell // 2 + 4
        parts.append(f'<text x="{left - 6}" y="{y}" text-anchor="end">'
                     f'{html.escape(str(lab))}</text>')
        for j in range(n):
            v = float(matrix[i][j])
            x = left + j * cell
            y0 = top + i * cell
            if v != v:  # NaN (constant column): undefined, not zero
                parts.append(
                    f'<rect x="{x}" y="{y0}" width="{cell - 2}" '
                    f'height="{cell - 2}" fill="rgb(85%,85%,85%)"/>'
                    f'<text x="{x + cell // 2 - 1}" '
                    f'y="{y0 + cell // 2 + 3}" text-anchor="middle">'
                    f'n/a</text>'
                )
                continue
            v = max(-1.0, min(1.0, v))
            # diverging shade: red for +, blue for -, white at 0
            mag = int(95 - 55 * abs(v))
            color = (f"rgb(95%,{mag}%,{mag}%)" if v >= 0
                     else f"rgb({mag}%,{mag}%,95%)")
            parts.append(
                f'<rect x="{x}" y="{y0}" width="{cell - 2}" '
                f'height="{cell - 2}" fill="{color}"/>'
                f'<text x="{x + cell // 2 - 1}" y="{y0 + cell // 2 + 3}" '
                f'text-anchor="middle">{v:+.2f}</text>'
            )
    parts.append("</svg>")
    return "".join(parts)


def _column_charts_html(col_dict: dict) -> str:
    """Per-column chart block from the payloads in col_dict['plots'] and
    top_values — collapsed by default to keep the document scannable."""
    plots = col_dict.get("plots", {})
    tops = col_dict.get("top_values")
    charts = []
    h = plots.get("hist")
    if h and sum(h["counts"]):
        e = h["edges"]
        labels = [f"{e[0]:.4g}"] + [""] * (len(h["counts"]) - 2) + [f"{e[-1]:.4g}"]
        charts.append(_svg_bars(labels, h["counts"], "histogram"))
    if "box" in plots:
        charts.append(_svg_box(plots["box"], "box plot"))
    if "cdf" in plots:
        charts.append(_svg_line(plots["cdf"]["value"],
                                plots["cdf"]["cum_freq"], "CDF"))
    if "qq" in plots:
        charts.append(_svg_line(plots["qq"]["theoretical"],
                                plots["qq"]["sample"], "Q-Q vs normal"))
    for part, series in (plots.get("date_parts") or {}).items():
        if series["y"] and sum(series["y"]):
            charts.append(_svg_bars(series["x"], series["y"], f"{part} counts"))
    if isinstance(tops, dict):  # HeavyHitters.finalize payload
        tops = tops.get("top_k")
    if tops:
        try:
            labels = [str(t[0]) for t in tops]
            ys = [int(t[1]) for t in tops]
        except (TypeError, KeyError, IndexError):
            labels, ys = [], []
        if ys:
            charts.append(_svg_bars(labels, ys, "top values"))
    if not charts:
        return ""
    return (f'<details><summary>{html.escape(col_dict["column"])} charts '
            f'({len(charts)})</summary>' + "".join(charts) + "</details>")


def render_html(profile: TableProfile, verdicts: list | None = None,
                title: str = "Data Profile",
                word_freqs=None, corr=None) -> str:
    """Self-contained HTML (driver-side, like the reference's jinja
    render): table census + verdicts + per-column stats table + per-column
    inline-SVG charts (histogram, box, CDF, Q-Q, date-part bars, top
    values) built from the distributed pass's plot payloads.

    ``word_freqs`` (optional): a (word, n) frequency frame — e.g. the
    ``word_frequencies`` pipeline output — rendered as an inline-SVG word
    cloud, closing the reference's WordCloud panel (Profiler.py:813-850).

    ``corr`` (optional): a (labels, matrix) pair — e.g. feature names +
    ``CorrState.corr_matrix()`` from the streaming Gram partials —
    rendered as an inline-SVG heatmap, closing the reference's plotly
    correlation panel (Profiler.py:1019-1031).
    """
    d = full_report_dict(profile, verdicts)
    t = d["table"]
    rows = []
    for c in d["columns"]:
        stats = c.get("stats", {})
        rows.append(
            "<tr>" + "".join(
                f"<td>{html.escape(str(v))}</td>"
                for v in (
                    c["column"], c["logical_type"], c["null_count"],
                    c["blank_count"], c.get("distinct_count"),
                    c.get("uniqueness_index"),
                    round(stats.get("mean", float("nan")), 4) if stats else "",
                    c.get("max_length", ""), c["categorical_confidence"],
                )
            ) + "</tr>"
        )
    verdict_html = ""
    if verdicts is not None:
        vrows = "".join(
            f"<tr><td>{html.escape(v.check)}</td>"
            f"<td>{'PASS' if v.passed else 'FAIL'}</td>"
            f"<td>{v.violation_count}</td>"
            f"<td>{html.escape(json.dumps(v.stats, default=_json_default))}</td></tr>"
            for v in verdicts
        )
        verdict_html = (
            "<h2>Verdicts</h2><table border=1>"
            "<tr><th>check</th><th>result</th><th>violations</th><th>stats</th></tr>"
            + vrows + "</table>"
        )
    cloud_html = ""
    if word_freqs is not None and len(word_freqs):
        cloud = _svg_wordcloud(wordcloud_payload(word_freqs))
        if cloud:
            cloud_html = "<h2>Word cloud</h2>" + cloud
    corr_html = ""
    if corr is not None:
        labels, matrix = corr
        heat = _svg_heatmap(list(labels), matrix)
        if heat:
            corr_html = "<h2>Correlation</h2>" + heat
    return f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title></head><body>
<h1>{html.escape(title)}</h1>
<p>rows={t['row_count']} cols={t['column_count']} bytes={t['byte_size']}
nulls={t['total_null_values']} types={html.escape(json.dumps(t['type_census']))}</p>
{verdict_html}
<h2>Columns</h2><table border=1>
<tr><th>column</th><th>type</th><th>nulls</th><th>blanks</th><th>distinct</th>
<th>uniq%</th><th>mean</th><th>max len</th><th>cat conf</th></tr>
{''.join(rows)}</table>
{cloud_html}
{corr_html}
<h2>Charts</h2>
{''.join(_column_charts_html(c) for c in d["columns"])}
</body></html>"""


def write_html_report(profile: TableProfile, path: str,
                      verdicts: list | None = None, compress: bool = True,
                      word_freqs=None, corr=None) -> str:
    """Write the HTML report, gzip'd like the reference
    (Profiler.py:507-509 writes .html.gz)."""
    doc = render_html(profile, verdicts, word_freqs=word_freqs, corr=corr)
    if compress:
        if not path.endswith(".gz"):
            path += ".gz"
        with gzip.open(path, "wt") as f:
            f.write(doc)
    else:
        with open(path, "w") as f:
            f.write(doc)
    return path
