"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship pipeline — derive the transcript fact table from
  sf0.001 events (sessionization window), run the full validation engine
  (profile pass + uniqueness shuffle + referential broadcast joins +
  drift), return the verdict table.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2), each ``sf_dir -> DataFrame/Table/Dataset``.
- ``oracle_sql()``: DuckDB twins with identical column names; entries
  without a twin get the driver's weaker rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    import pandas as pd

    from advanced_data_profile_ray.pipelines.queries import q_transcripts
    from advanced_data_profile_ray.pipelines.validate import validate_transcripts
    from advanced_data_profile_ray.sources.transcripts import TOOL_CATALOG

    sf_dir = "/root/testdata/sf0.001"
    transcripts = q_transcripts(sf_dir)
    # roster: every derived conv_id is valid; tool catalog: event types +
    # the synthetic catalog (so the checks exercise the broadcast path)
    roster = [f"c{i:08d}" for i in range(200)]
    report = validate_transcripts(
        transcripts,
        valid_conv_ids=roster,
        valid_tools=["error"] + TOOL_CATALOG,
        max_text_null_pct=100.0,
        max_text_blank_pct=100.0,
    )
    return pd.DataFrame([v.to_dict() | {"stats": str(v.stats)} for v in report.verdicts])


def queries() -> dict[str, Callable[[str], Any]]:
    from advanced_data_profile_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from advanced_data_profile_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
