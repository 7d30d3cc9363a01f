"""Crawler registry — ordered like the reference config
(config.json.example:56-135); order matters for link-to-existing-only
crawlers (SURVEY.md §7.3)."""

from __future__ import annotations

from .bgpkit_pfx2asn import PfxToAsn
from .ripe_as_names import RipeAsNames
from .caida_asrank import CaidaAsRank
from .bgpkit_as2rel import BgpkitAs2RelV4

CRAWLER_ORDER = [
    PfxToAsn,
    RipeAsNames,
    CaidaAsRank,
    BgpkitAs2RelV4,
]

REGISTRY = {c.NAME: c for c in CRAWLER_ORDER}
