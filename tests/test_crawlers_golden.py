"""Golden-compare: each Spark crawler's emitted (subj, pred, obj) triples vs
the straight-line Python oracle (golden.py), P/R ≥ 0.95 required, exact
equality expected at fixture scale (FIXTURES.md)."""

from __future__ import annotations

import pytest

from iyp_spark.fixtures import GENERATORS
from iyp_spark.golden import GOLDEN, precision_recall
from iyp_spark.crawlers import REGISTRY


def emitted_triples(store, name) -> set:
    rows = (
        store.read_triples(name)
        .select("subj_label", "subj_key", "pred", "obj_label", "obj_key")
        .collect()
    )
    return {tuple(r) for r in rows}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_crawler_matches_golden(store, corpus, name):
    crawler = REGISTRY[name](store)
    crawler.run()
    crawler.unit_test()

    docs = GENERATORS[name](0.3)
    golden = GOLDEN[name](docs)
    emitted = emitted_triples(store, name)

    p, r = precision_recall(emitted, golden)
    assert p >= 0.95 and r >= 0.95, (
        f"{name}: P={p:.3f} R={r:.3f}; "
        f"missing={list(golden - emitted)[:5]} extra={list(emitted - golden)[:5]}"
    )
    # at fixture scale we expect exact agreement
    assert emitted == golden, (
        f"{name}: {len(golden - emitted)} missing, {len(emitted - golden)} extra; "
        f"missing={list(golden - emitted)[:5]} extra={list(emitted - golden)[:5]}"
    )


def test_originate_props_carry_entry(store, corpus):
    """ORIGINATE props include the source entry fields (ref pfx2asn.py:57)."""
    REGISTRY["bgpkit.pfx2asn"](store).run()
    row = (
        store.read_triples("bgpkit.pfx2asn").select("props", "subj_key", "obj_key")
        .first()
    )
    assert row["props"]["asn"] == row["subj_key"]
    assert row["props"]["prefix"] == row["obj_key"]


def test_prefix_nodes_double_labeled(store, corpus):
    """BGPPrefix nodes carry the Prefix label too (ref pfx2asn.py:47-49)."""
    REGISTRY["bgpkit.pfx2asn"](store).run()
    labels = (
        store.read_nodes("BGPPrefix").select("labels").first()["labels"]
    )
    assert set(labels) >= {"BGPPrefix", "Prefix"}
