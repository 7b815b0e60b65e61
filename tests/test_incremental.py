"""Incremental (high-watermark) extraction against the mock server:
full first pull, delta-only second pull, no-change no-op, resumable
state, numeric (not lexicographic) watermark advance, and the
two-phase commit contract (crash between extract and sink loses
nothing — the delta is re-served until committed)."""

from __future__ import annotations

import json

import pytest

from sf_etl_spark.connector.client import SfClient
from sf_etl_spark.connector.incremental import extract_incremental
from sf_etl_spark.connector.mockserver import MockSalesforce


@pytest.fixture()
def server():
    s = MockSalesforce(n_rows=0, page_size=10)
    # monotonic integer watermark field, served as wire strings like
    # every other mock value; 25 rows -> 3 pages (pagination exercised)
    s.rows = [
        {"Id": f"500{i:015d}", "Priority": ["Low", "High"][i % 2], "Version": str(i)}
        for i in range(25)
    ]
    url = s.start()
    yield s, url
    s.stop()


def make_client(url: str) -> SfClient:
    c = SfClient(client_id="app", client_secret="shhh", login_url=url, backoff_base=0.01)
    c.login("user@test", "pw")
    return c


def test_incremental_full_then_delta_then_noop(server, tmp_path):
    s, url = server
    client = make_client(url)
    state = str(tmp_path / "case.watermark.json")

    recs, res = extract_incremental(client, "Case", ["Id", "Priority"], "Version", state)
    assert res.n_rows == 25 and res.watermark == 24
    # the watermark field is force-included in the SELECT list
    assert all("Version" in r for r in recs)
    res.commit()  # "sink" succeeded

    # no changes -> nothing fetched, state untouched
    recs, res = extract_incremental(client, "Case", ["Id", "Priority"], "Version", state)
    assert res.n_rows == 0 and res.watermark == 24

    # 5 new/updated rows appear upstream -> only the delta moves
    s.rows.extend(
        {"Id": f"500{i:015d}", "Priority": "High", "Version": str(i)} for i in range(25, 30)
    )
    recs, res = extract_incremental(client, "Case", ["Id", "Priority"], "Version", state)
    assert res.n_rows == 5 and res.watermark == 29
    assert sorted(int(r["Version"]) for r in recs) == [25, 26, 27, 28, 29]
    res.commit()

    # state file is plain JSON -> a new process resumes where we left off
    assert json.load(open(state))["watermark"] == 29
    recs, res = extract_incremental(client, "Case", ["Id", "Priority"], "Version", state)
    assert res.n_rows == 0


def test_incremental_uncommitted_delta_is_reserved(server, tmp_path):
    """Crash between extract and sink: commit() never runs, so the
    next run re-extracts the SAME delta (at-least-once, no loss)."""
    s, url = server
    client = make_client(url)
    state = str(tmp_path / "wm.json")

    recs, res = extract_incremental(client, "Case", ["Id"], "Version", state)
    assert res.n_rows == 25 and not res.committed
    # no commit — simulate a crash before the sink write landed

    recs2, res2 = extract_incremental(client, "Case", ["Id"], "Version", state)
    assert res2.n_rows == 25  # nothing lost
    assert sorted(r["Id"] for r in recs2) == sorted(r["Id"] for r in recs)
    res2.commit()
    assert json.load(open(state))["watermark"] == 24

    # commit() is idempotent and a no-op fetch is auto-committed
    res2.commit()
    _, res3 = extract_incremental(client, "Case", ["Id"], "Version", state)
    assert res3.n_rows == 0 and res3.committed
    res3.commit()  # must not clobber state with None/old values
    assert json.load(open(state))["watermark"] == 24


def test_incremental_numeric_not_lexicographic(server, tmp_path):
    # rows 0..25+ include Version "9" and "10": a lexicographic max
    # would pick "9" and re-extract 10..24 forever
    s, url = server
    client = make_client(url)
    state = str(tmp_path / "wm.json")
    _, res = extract_incremental(client, "Case", ["Id"], "Version", state)
    assert res.watermark == 24 != 9


def test_incremental_state_via_fs_uri(server, tmp_path):
    """The watermark state resolves through pyarrow.fs (fsutil), so a
    file:// URI — the stand-in for an object-store checkpoint path a
    real cluster uses — reads/writes the same state the bare local
    path does; the old os.* code would have treated 'file:///…' as a
    relative path named 'file:'."""
    import os

    s, url = server
    client = make_client(url)
    state = f"file://{tmp_path}/deep/dir/wm.json"
    recs, res = extract_incremental(client, "Case", ["Id"], "Version", state)
    assert res.n_rows == len(recs) > 0
    res.commit()
    # landed at the URI's local path (parent dirs created), not at ./file:
    assert json.load(open(tmp_path / "deep" / "dir" / "wm.json"))["watermark"] == res.watermark
    assert not os.path.exists("file:")
    # second run through the URI sees the committed watermark: no delta
    _, res2 = extract_incremental(client, "Case", ["Id"], "Version", state)
    assert res2.n_rows == 0 and res2.committed
