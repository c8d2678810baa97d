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


def test_fragment_extraction_granularity():
    """Round-11 per-entry granularity, on a synthetic module: editing one
    entry's declaration changes ONLY its fragment; editing a shared helper
    changes ONLY the residual; fragments are the innermost call carrying
    the name literal."""
    from datafusion_ray_spark.certledger import _extract_fragments

    src = (
        "HELPER = 'SELECT 1'\n"
        "def q(n, s):\n"
        "    _Q[n] = (n, s)\n"
        "q('alpha', 'SELECT a FROM t')\n"
        "q('beta', f'{HELPER} UNION SELECT b')\n"
    )
    names = {"alpha", "beta"}
    frags, residual = _extract_fragments(src, names)
    assert set(frags) == names
    assert "SELECT a FROM t" in frags["alpha"]
    assert "beta" not in frags["alpha"]

    # edit alpha's SQL -> only alpha's fragment moves
    f2, r2 = _extract_fragments(
        src.replace("SELECT a FROM t", "SELECT a2 FROM t"), names
    )
    assert f2["alpha"] != frags["alpha"]
    assert f2["beta"] == frags["beta"]
    assert r2 == residual

    # edit the shared helper -> only the residual moves
    f3, r3 = _extract_fragments(
        src.replace("'SELECT 1'", "'SELECT 2'"), names
    )
    assert f3 == frags
    assert r3 != residual

    # a run callable referenced ONLY by its declaration is claimed into
    # that entry's fragment: editing its body stales just that entry;
    # a helper referenced twice stays shared residual
    src_ext = (
        "def run_gamma(s):\n    return s + 1\n"
        "def shared_helper(s):\n    return s * 2\n"
        "def run_delta(s):\n    return shared_helper(s)\n"
        "def run_eps(s):\n    return shared_helper(s) - 1\n"
        "E('gamma', run_gamma)\n"
        "E('delta', run_delta)\n"
        "E('eps', run_eps)\n"
    )
    ge, re0 = _extract_fragments(src_ext, {"gamma", "delta", "eps"})
    assert "return s + 1" in ge["gamma"]          # run fn claimed
    assert "shared_helper" not in ge["gamma"]
    g2, re2 = _extract_fragments(
        src_ext.replace("return s + 1", "return s + 2"),
        {"gamma", "delta", "eps"},
    )
    assert g2["gamma"] != ge["gamma"]             # only gamma moves
    assert g2["delta"] == ge["delta"] and g2["eps"] == ge["eps"]
    assert re2 == re0
    g3, re3 = _extract_fragments(                 # helper edit -> residual
        src_ext.replace("return s * 2", "return s * 3"),
        {"gamma", "delta", "eps"},
    )
    assert g3 == ge and re3 != re0

    # reorder two adjacent declarations -> nothing moves (fragments are
    # positionless and whitespace-only residual chunks are dropped)
    reordered = src.replace(
        "q('alpha', 'SELECT a FROM t')\nq('beta', f'{HELPER} UNION SELECT b')",
        "q('beta', f'{HELPER} UNION SELECT b')\nq('alpha', 'SELECT a FROM t')",
    )
    assert reordered != src
    f4, r4 = _extract_fragments(reordered, names)
    assert f4 == frags
    assert r4 == residual


def test_noop_append_stales_nothing_existing():
    """Adding a new registry entry to a real declaration module changes
    neither any existing entry's fragment nor the module residual — the
    round-10 saturation (any append staled every sibling) is gone."""
    from datafusion_ray_spark.certledger import _extract_fragments
    from datafusion_ray_spark.queries.registry import build_registry

    path = os.path.join(
        REPO_ROOT, "datafusion_ray_spark", "queries", "coverage4.py"
    )
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    names = set(build_registry())
    before_frags, before_residual = _extract_fragments(src, names)
    assert before_frags, "coverage4.py hosts declarations"

    appended = src + '\n_q("zz_new_entry", "SELECT 1 AS one", "noop")\n'
    after_frags, after_residual = _extract_fragments(
        appended, names | {"zz_new_entry"}
    )
    assert after_residual == before_residual
    assert "zz_new_entry" in after_frags
    for name, frag in before_frags.items():
        assert after_frags[name] == frag, name


def test_touch_one_operator_file_stales_only_its_entries():
    """Integration: a working-tree edit to ONE operator file re-stales
    exactly the entries whose import closure reaches it — every other
    entry's ledger row is byte-identical. (eventops.py: the temporal-ops
    family, 9 entries.)"""
    from datafusion_ray_spark.certledger import build_ledger

    target = os.path.join(
        REPO_ROOT, "datafusion_ray_spark", "operators", "eventops.py"
    )
    rel = "datafusion_ray_spark/operators/eventops.py"
    baseline = build_ledger()
    reaches = {n for n, e in baseline.items() if rel in e.files}
    assert 0 < len(reaches) < len(baseline) / 4, (
        "eventops.py must be a narrow-reach file for this test"
    )
    with open(target, encoding="utf-8") as fh:
        orig = fh.read()
    try:
        with open(target, "w", encoding="utf-8") as fh:
            fh.write(orig + "\n# ledger-granularity probe\n")
        edited = build_ledger()
    finally:
        with open(target, "w", encoding="utf-8") as fh:
            fh.write(orig)
    changed = {
        n for n in baseline
        if (baseline[n].code_hash, baseline[n].stale,
            baseline[n].last_touched_round)
        != (edited[n].code_hash, edited[n].stale,
            edited[n].last_touched_round)
    }
    assert changed <= reaches, (
        f"edit leaked beyond eventops closure: {sorted(changed - reaches)}"
    )
    for n in reaches:  # every reaching entry sees the touch
        assert edited[n].code_hash != baseline[n].code_hash, n
        assert edited[n].stale, n


def test_ledger_regenerated_at_head(committed):
    """Round-11 (round-10 verdict #1): the committed ledger must be
    generated from the code the tree actually ships — the package tree
    hash stamped at generation must match a live recompute. ANY package
    edit after regeneration (committed or not) fails this test until
    ``python -m datafusion_ray_spark.certledger`` is re-run, enforcing
    regenerate-LAST; driver artifact commits (CORRECTNESS/VERDICT/bench
    files) don't touch the package and pass."""
    from datafusion_ray_spark.certledger import package_tree_hash

    assert committed.get("package_tree_hash") == package_tree_hash(), (
        "package source changed after CERT_LEDGER.json was generated — "
        "rerun `python -m datafusion_ray_spark.certledger` as the LAST "
        "step before the round's final commit"
    )


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
