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
