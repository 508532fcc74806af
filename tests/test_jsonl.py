"""JSONL source/sink roundtrip against the parquet ground truth."""

import os

import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_matches_parquet(ray_session, tmp_path):
    import ray.data as rd

    from advanced_data_profile_ray.sources.jsonl import (
        jsonl_to_parquet, read_jsonl, write_jsonl_sharded)

    src = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                          columns=["doc_id", "text", "lang"])
    jdir = str(tmp_path / "docs_jsonl")
    write_jsonl_sharded(src, jdir)
    assert any(f.endswith(".json") for f in os.listdir(jdir))

    back = read_jsonl(jdir, columns=["doc_id", "lang"]).to_pandas()
    want = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    pd.testing.assert_frame_equal(
        back.sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True))

    # jsonl -> parquet migration path preserves content
    pdir = str(tmp_path / "docs_parquet")
    jsonl_to_parquet(jdir, pdir)
    conv = rd.read_parquet(pdir, columns=["doc_id", "text"]).to_pandas()
    want_t = pq.read_table(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).to_pandas()
    pd.testing.assert_frame_equal(
        conv.sort_values("doc_id").reset_index(drop=True),
        want_t.sort_values("doc_id").reset_index(drop=True))
