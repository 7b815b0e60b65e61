"""Incremental (high-watermark) extraction against the mock server:
full first pull, delta-only second pull, no-change no-op, resumable
state, and numeric (not lexicographic) watermark advance."""

from __future__ import annotations

import json

import pytest

from sf_etl_spark.connector.client import SfClient
from sf_etl_spark.connector.incremental import extract_incremental
from tests.mock_sf_server import MockSalesforce


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

    # state file is plain JSON -> a new process resumes where we left off
    assert json.load(open(state))["watermark"] == 29
    recs, res = extract_incremental(client, "Case", ["Id", "Priority"], "Version", state)
    assert res.n_rows == 0


def test_incremental_numeric_not_lexicographic(server, tmp_path):
    # rows 0..25+ include Version "9" and "10": a lexicographic max
    # would pick "9" and re-extract 10..24 forever
    s, url = server
    client = make_client(url)
    state = str(tmp_path / "wm.json")
    _, res = extract_incremental(client, "Case", ["Id"], "Version", state)
    assert res.watermark == 24 != 9
