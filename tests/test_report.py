"""Plot-payload tests: date-part bar series and word-cloud payload
(reference: per-component date plots Profiler.py:780-794, word cloud
Profiler.py:813-850)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_date_part_plot_data(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset
    from advanced_data_profile_ray.report import date_part_plot_data, full_report_dict

    ts = pd.to_datetime(["2024-01-01 03:15:30", "2024-01-01 11:45:00",
                         "2024-02-29 03:15:30"])
    prof = profile_dataset(rd.from_arrow(pa.table({"ts": pa.array(ts, pa.timestamp("us"))})))
    data = date_part_plot_data(prof.columns["ts"])
    assert data["hour"] == {"x": [3, 11], "y": [2, 1]}
    assert data["month"] == {"x": [1, 2], "y": [2, 1]}
    assert data["second"] == {"x": [0, 30], "y": [1, 2]}
    # and it rides into the report JSON
    rep = full_report_dict(prof)
    col = next(c for c in rep["columns"] if c["column"] == "ts")
    assert col["plots"]["date_parts"]["year"] == {"x": [2024], "y": [3]}


def test_wordcloud_payload():
    from advanced_data_profile_ray.report import wordcloud_payload

    freqs = pd.DataFrame({"word": ["alpha", "beta", "gamma"], "n": [10, 5, 1]})
    out = wordcloud_payload(freqs, max_words=2)
    assert [o["word"] for o in out] == ["alpha", "beta"]
    assert out[0]["size"] == 64.0 and out[0]["count"] == 10
    assert out[1]["size"] < out[0]["size"]
    assert wordcloud_payload(freqs.iloc[:0]) == []


def test_render_html_embeds_svg_charts(ray_session):
    """Round-4 report-parity closing: the HTML document must carry
    inline-SVG charts (histogram, box, CDF, Q-Q, date-part bars, top
    values) rendered from the distributed pass's plot payloads — no
    chart library, self-contained."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset
    from advanced_data_profile_ray.report import render_html

    from advanced_data_profile_ray.stages.profile_partial import ProfileConfig

    rng = np.random.default_rng(3)
    ts = pd.to_datetime(["2024-01-01 03:15:30"] * 40 + ["2024-02-29 11:45:00"] * 20)
    t = pa.table({
        "x": pa.array(rng.normal(size=60)),
        "cat": pa.array(["a"] * 40 + ["b"] * 20),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    cfg = ProfileConfig(histogram_edges={"x": np.linspace(-3, 3, 13).tolist()})
    prof = profile_dataset(rd.from_arrow(t), cfg)
    doc = render_html(prof, title="t")
    assert doc.count("<svg") >= 5
    for label in ("histogram", "box plot", "CDF", "Q-Q vs normal",
                  "top values", "hour counts"):
        assert label in doc, label
    # payload numbers flow through: the categorical top value count
    assert "polyline" in doc and "rect" in doc


def test_hist_plot_data_payload(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset
    from advanced_data_profile_ray.report import hist_plot_data

    from advanced_data_profile_ray.stages.profile_partial import ProfileConfig

    cfg = ProfileConfig(histogram_edges={"x": [0.0, 0.5, 1.0, 1.5, 2.0, 2.5]})
    prof = profile_dataset(rd.from_arrow(
        pa.table({"x": pa.array([0.0, 0.5, 1.0, 1.5, 2.0] * 8)})), cfg)
    h = hist_plot_data(prof.columns["x"])
    assert h is not None and sum(h["counts"]) > 0
    assert len(h["edges"]) == len(h["counts"]) + 1


def test_render_html_word_cloud_panel(ray_session):
    """Round-5 report-parity closing: passing a (word, n) frequency frame
    (the word_frequencies pipeline output) renders an inline-SVG word
    cloud — the reference's WordCloud image (Profiler.py:813-850) —
    with count-scaled font sizes, biggest terms first, XML-escaped."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset
    from advanced_data_profile_ray.pipelines.text import word_frequencies
    from advanced_data_profile_ray.report import render_html

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha alpha alpha beta & gamma",
            "alpha beta beta <tag> words words",
            "alpha gamma words everywhere here",
        ]),
    })
    freqs = word_frequencies(rd.from_arrow(docs), text_col="text")
    if not isinstance(freqs, pd.DataFrame):
        freqs = freqs.to_pandas()
    prof = profile_dataset(rd.from_arrow(docs))
    doc = render_html(prof, title="t", word_freqs=freqs)
    assert "Word cloud" in doc and "top terms" in doc
    # biggest term renders at the max font size and carries its count
    assert 'font-size="64.0"' in doc or 'font-size="64"' in doc
    assert ">alpha<" in doc
    # without freqs the panel is absent (backwards compatible)
    assert "Word cloud" not in render_html(prof, title="t")


def test_render_html_corr_heatmap_panel(ray_session):
    """Round-5 report-parity: passing (labels, matrix) renders an
    inline-SVG correlation heatmap — the reference's plotly corr figure
    (Profiler.py:1019-1031) — with one shaded cell per pair, diverging
    color by sign, and the value printed in-cell."""
    import numpy as np
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.profile import profile_dataset
    from advanced_data_profile_ray.report import render_html

    t = pa.table({"a": pa.array([1.0, 2.0, 3.0]),
                  "b": pa.array([2.0, 4.0, 6.0])})
    prof = profile_dataset(rd.from_arrow(t))
    m = np.array([[1.0, -0.5], [-0.5, 1.0]])
    doc = render_html(prof, title="t", corr=(["a", "b"], m))
    assert "Correlation" in doc
    assert "+1.00" in doc and "-0.50" in doc
    # diverging shades: red family for positive, blue family for negative
    assert 'fill="rgb(95%,40%,40%)"' in doc      # |v|=1 positive
    assert 'fill="rgb(67%,67%,95%)"' in doc      # |v|=0.5 negative
    # without corr the panel is absent (backwards compatible)
    assert "Correlation" not in render_html(prof, title="t")
