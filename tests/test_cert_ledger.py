"""Staleness-driven re-certification ledger (round-10, the rotation's
successor): the committed CERT_LEDGER.json must be reproducible from the
repo's actual state (git history, CORRECTNESS_r*.json union, per-entry
import closures), and the registry's declared order — the window the
driver actually certifies — must BE the ledger's pick. Together these make
"the window is the 50 stalest/touched entries" a checked property, not
prose."""

from __future__ import annotations

import json
import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(REPO_ROOT, "CERT_LEDGER.json")


@pytest.fixture(scope="module")
def committed():
    with open(LEDGER_PATH, encoding="utf-8") as fh:
        return json.load(fh)


def test_ledger_shape(committed):
    from datafusion_ray_spark.queries.registry import build_registry

    names = set(build_registry())
    assert set(committed["entries"]) == names, "ledger covers the registry"
    assert committed["window_size"] == 50
    assert len(committed["window"]) == 50
    assert committed["window"] == committed["pinned"] + committed["rotating"]
    assert set(committed["window"]) <= names
    for entry in committed["entries"].values():
        assert set(entry) >= {
            "last_certified_round", "last_touched_round", "stale",
            "code_hash", "files",
        }


def test_registry_order_is_the_ledger_window(committed):
    """The driver certifies the FIRST 50 registry entries; that prefix
    must be exactly the committed ledger's window."""
    from datafusion_ray_spark.queries.registry import build_registry

    first50 = list(build_registry())[:50]
    assert first50 == committed["window"]


def test_ledger_reproducible_from_repo_state(committed):
    """Live recompute == committed file: per-entry code hashes (catches
    editing an implementation without regenerating the ledger), staleness
    verdicts, certification history, and the picked window. The recompute
    bounds certification evidence to rounds below the current one, so the
    driver writing CORRECTNESS_r{current} mid-round cannot flip it."""
    from datafusion_ray_spark.certledger import (
        build_ledger,
        pick_window,
        pinned_names,
    )

    live = build_ledger()
    assert set(live) == set(committed["entries"])
    for name, entry in committed["entries"].items():
        got = live[name]
        assert got.code_hash == entry["code_hash"], (
            f"{name}: implementation changed since CERT_LEDGER.json was "
            "generated — rerun `python -m datafusion_ray_spark.certledger`"
        )
        assert got.last_certified_round == entry["last_certified_round"]
        assert got.stale == entry["stale"], name
        assert got.files == entry["files"], name
    pinned = pinned_names()
    assert pinned == committed["pinned"]
    assert pick_window(live, pinned) == committed["window"]


def test_pick_window_policy():
    """Unit check of the ranking: stale entries outrank fresh ones, older
    certification outranks newer, name breaks ties; pinned entries lead
    regardless of staleness."""
    from datafusion_ray_spark.certledger import LedgerEntry, pick_window

    def mk(name, stale, cert):
        return LedgerEntry(
            name=name, files=[], code_hash="", last_certified_round=cert,
            last_touched_round=0, stale=stale,
        )

    ledger = {
        e.name: e
        for e in [
            mk("pin", stale=False, cert=9),
            mk("fresh_old", stale=False, cert=2),
            mk("stale_new", stale=True, cert=8),
            mk("stale_old", stale=True, cert=3),
            mk("stale_never", stale=True, cert=None),
            mk("stale_old_b", stale=True, cert=3),
        ]
    }
    got = pick_window(ledger, pinned=["pin"], n=5)
    assert got == [
        "pin", "stale_never", "stale_old", "stale_old_b", "stale_new",
    ]
    # fresh entries fill only the slots staleness leaves open
    got6 = pick_window(ledger, pinned=["pin"], n=6)
    assert got6[-1] == "fresh_old"


def test_certified_rounds_bounded():
    """certified_rounds(before_round=N) must ignore round >= N evidence
    (the current round's in-flight CORRECTNESS file)."""
    from datafusion_ray_spark.certledger import certified_rounds

    current = certified_rounds()
    bounded = certified_rounds(before_round=2)
    assert all(rnd <= 1 for rnd in bounded.values())
    # q1 has been green since round 1 in both views
    assert bounded.get("q1") == 1
    assert current.get("q1", 0) >= bounded["q1"]
