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


def full_report_dict(profile: TableProfile, verdicts: list | None = None,
                     top_k: int = 10) -> dict:
    out = profile.finalize(top_k)
    for col_dict in out["columns"]:
        col = profile.columns[col_dict["column"]]
        plots = {}
        for name, fn in (("box", box_plot_data), ("qq", qq_plot_data),
                         ("cdf", cdf_plot_data),
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


def render_html(profile: TableProfile, verdicts: list | None = None,
                title: str = "Data Profile") -> str:
    """Minimal self-contained HTML (driver-side, like the reference's
    jinja render — content parity over styling parity)."""
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
    return f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title></head><body>
<h1>{html.escape(title)}</h1>
<p>rows={t['row_count']} cols={t['column_count']} bytes={t['byte_size']}
nulls={t['total_null_values']} types={html.escape(json.dumps(t['type_census']))}</p>
{verdict_html}
<h2>Columns</h2><table border=1>
<tr><th>column</th><th>type</th><th>nulls</th><th>blanks</th><th>distinct</th>
<th>uniq%</th><th>mean</th><th>max len</th><th>cat conf</th></tr>
{''.join(rows)}</table></body></html>"""


def write_html_report(profile: TableProfile, path: str,
                      verdicts: list | None = None, compress: bool = True) -> str:
    """Write the HTML report, gzip'd like the reference
    (Profiler.py:507-509 writes .html.gz)."""
    doc = render_html(profile, verdicts)
    if compress:
        if not path.endswith(".gz"):
            path += ".gz"
        with gzip.open(path, "wt") as f:
            f.write(doc)
    else:
        with open(path, "w") as f:
            f.write(doc)
    return path
