"""As-of and range joins: tie and boundary semantics on a hand-built log.

- as-of is STRICTLY prior: a view at exactly the click's timestamp must
  not match; the latest earlier view wins.
- range window is half-open [ts, ts+7d): a purchase exactly at ts counts,
  one exactly at ts+7d does not.
"""

import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000
DAY = 24 * 3600 * US
T0 = 1_600_000_000 * US


def _write_events(tmp_path):
    rows = [
        # (event_id, ts_us, user_id, event_type)
        (1, T0 + 10 * US, 1, "view"),
        (2, T0 + 20 * US, 1, "view"),
        (3, T0 + 20 * US, 1, "click"),   # tie with view 2 → must match view 1? NO:
        #   strictly-prior means the view at the SAME us (id 2) is excluded,
        #   so the match is view 1 at T0+10
        (4, T0 + 30 * US, 1, "click"),   # matches view 2 (latest prior)
        (5, T0 + 5 * US, 2, "click"),    # user 2 has no prior view → dropped
        (6, T0, 3, "signup"),
        (7, T0, 3, "purchase"),          # at ts → counts
        (8, T0 + 7 * DAY - 1, 3, "purchase"),  # last us inside → counts
        (9, T0 + 7 * DAY, 3, "purchase"),      # at ts+7d → excluded
        (10, T0, 4, "signup"),           # user 4: zero purchases → count 0
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))


def test_asof_strictly_prior(tmp_path):
    from dedup_ray.pipelines.queries import asof_join_events

    _write_events(tmp_path)
    df = (
        asof_join_events(str(tmp_path))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert list(df.index) == [3, 4]  # click 5 has no prior view
    assert df.loc[3, "view_ts_us"] == T0 + 10 * US  # same-us view excluded
    assert df.loc[4, "view_ts_us"] == T0 + 20 * US  # latest prior wins
    assert df.loc[4, "lag_us"] == 10 * US


def test_range_half_open_window(tmp_path):
    from dedup_ray.pipelines.queries import range_join_events

    _write_events(tmp_path)
    df = (
        range_join_events(str(tmp_path))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert df.loc[6, "n_in_window"] == 2  # at-ts and last-us purchases
    assert df.loc[10, "n_in_window"] == 0  # zero-count row kept
