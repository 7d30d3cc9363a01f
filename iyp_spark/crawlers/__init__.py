"""Crawler registry — ordered like the reference config
(config.json.example:56-135); order matters for crawlers that link against
or prefer pre-existing nodes (SURVEY.md §7.3): tranco must precede
cisco.umbrella (DomainName preference), etc."""

from __future__ import annotations

from .bgpkit_pfx2asn import PfxToAsn
from .ripe_as_names import RipeAsNames
from .caida_asrank import CaidaAsRank
from .bgpkit_as2rel import BgpkitAs2RelV4, BgpkitAs2RelV6
from .tranco_top1m import TrancoTop1M
from .cisco_umbrella import CiscoUmbrella
from .ihr_hegemony import IhrHegemonyV4, IhrHegemonyV6
from .bgptools_tags import BgpToolsTags
from .stanford_asdb import StanfordAsdb
from .apnic_eyeball import ApnicEyeball
from .peeringdb_org import PeeringdbOrg
from .peeringdb_ix import PeeringdbIx
from .caida_as2org import CaidaAs2Org
from .nro_delegated import NroDelegatedStats
from .openintel import (OpenIntel, OpenIntelCrux, OpenIntelInfraMx,
                        OpenIntelInfraNs, OpenIntelToplist, OpenIntelUmbrella1M)
from .inetintel_as_org import InetIntelAsOrg
from .pch_routing import PchRoutingV4, PchRoutingV6
from .worldbank_pop import WorldBankCountryPop
from .iana_root_zone import IanaRootZone
from .ripe_roa import RipeRoa
from .ooni import (OoniFacebookMessenger, OoniHttpHeaderFieldManipulation,
                   OoniHttpInvalidRequestLine, OoniPsiphon, OoniRiseupVpn,
                   OoniSignal, OoniStunReachability, OoniTelegram, OoniTor, OoniTorsf,
                   OoniVanillaTor, OoniWebConnectivity, OoniWhatsApp)
from .caida_ixs import CaidaIxAsns, CaidaIxs
from .geolite import IpinfoIpCountry, MaxmindGeoliteCountry
from .alice_lg import (AliceLgAmsix, AliceLgBcix, AliceLgDdix,
                       AliceLgDecix, AliceLgIxAustralia, AliceLgIxBr,
                       AliceLgLinx, AliceLgMegaport, AliceLgNetnod,
                       AliceLgNzix, AliceLgPix, AliceLgSfmix, AliceLgSix,
                       AliceLgTopix)
from .ihr_country_dependency import IhrCountryDependency
from .ihr_rov import IhrRov
from .flat_linkers import (BgpToolsAsNames, CitizenLabUrldb,
                           EmileabenAsNames, VirginiaTechRovista)
from .iana_address_space import IanaAddressSpace
from .cloudflare import (CloudflareDnsTopAses, CloudflareDnsTopLocations,
                         CloudflareRankingBucket, CloudflareTop100)
from .ripe_atlas_probes import RipeAtlasProbes
from .anycast_asrel import (BgpkitPeerstats, BgpToolsAnycastV4,
                            BgpToolsAnycastV6, CaidaAsRelationshipsV4,
                            CaidaAsRelationshipsV6)
from .amazon_aws import AmazonAwsIpRanges
from .utwente_laces import UtwenteLacesV4, UtwenteLacesV6
from .peeringdb_fac import PeeringdbFac
from .google_crux import GoogleCruxCountry
from .ripe_atlas_measurements import RipeAtlasMeasurements
from .simulamet_rdns import SimulametRirdataRdns
from .manrs_members import ManrsMembers
from .openintel_dnsgraph import (OpenIntelDnsgraph, OpenIntelDnsgraphCrux,
                                 OpenIntelDnsgraphJp, OpenIntelDnsgraphNl,
                                 OpenIntelDnsgraphRdns)

CRAWLER_ORDER = [
    PfxToAsn,
    RipeAsNames,
    CaidaAsRank,
    BgpkitAs2RelV4,
    BgpkitAs2RelV6,
    TrancoTop1M,
    IhrHegemonyV4,
    IhrHegemonyV6,
    BgpToolsTags,
    StanfordAsdb,
    ApnicEyeball,
    PeeringdbOrg,
    CaidaAs2Org,
    OpenIntel,
    PchRoutingV4,
    PchRoutingV6,
    IanaRootZone,
    RipeRoa,
    MaxmindGeoliteCountry,
    IpinfoIpCountry,
    IhrCountryDependency,
    IhrRov,
    BgpToolsAsNames,
    EmileabenAsNames,
    VirginiaTechRovista,
    CitizenLabUrldb,
    IanaAddressSpace,
    CloudflareTop100,
    CloudflareRankingBucket,
    RipeAtlasProbes,
    BgpToolsAnycastV4,
    BgpToolsAnycastV6,
    CaidaAsRelationshipsV4,
    CaidaAsRelationshipsV6,
    BgpkitPeerstats,
    AmazonAwsIpRanges,
    UtwenteLacesV4,
    UtwenteLacesV6,
    OpenIntelInfraNs,
    OpenIntelUmbrella1M,
    OpenIntelInfraMx,
    OpenIntelCrux,
    OpenIntelToplist,
    GoogleCruxCountry,
    SimulametRirdataRdns,
    ManrsMembers,
    OpenIntelDnsgraph,
    OpenIntelDnsgraphCrux,
    OpenIntelDnsgraphJp,
    OpenIntelDnsgraphNl,
    OpenIntelDnsgraphRdns,
    OoniWebConnectivity,
    OoniTelegram,
    OoniWhatsApp,
    OoniSignal,
    OoniPsiphon,
    OoniTor,
    OoniHttpInvalidRequestLine,
    OoniHttpHeaderFieldManipulation,
    OoniRiseupVpn,
    OoniVanillaTor,
    OoniTorsf,
    OoniFacebookMessenger,
    OoniStunReachability,
    # second wave (NEEDS_EXISTING): read dictionaries/edges from the first
    CiscoUmbrella,  # prefers existing DomainName/HostName nodes
    PeeringdbIx,    # resolves orgs through PeeringdbOrgID EXTERNAL_ID edges
    PeeringdbFac,   # same org indirection; Facility nodes
    RipeAtlasMeasurements,  # reads AtlasProbe.status_id node props
    InetIntelAsOrg,  # org siblings only among pre-existing Organizations
    WorldBankCountryPop,  # links only pre-existing Country nodes
    NroDelegatedStats,  # links only pre-existing AS nodes (runs last)
    # third wave: reads EXTERNAL_ID edges written by wave-2 peeringdb.ix
    CaidaIxs,
    # fourth wave: reads CaidaIXID edges written by caida.ixs
    CaidaIxAsns,
    AliceLgDecix,  # LPMs member IPs against wave-2/3 PeeringLANs
    AliceLgAmsix,
    AliceLgLinx,
    AliceLgBcix,
    AliceLgDdix,
    AliceLgIxAustralia,
    AliceLgIxBr,
    AliceLgMegaport,
    AliceLgNetnod,
    AliceLgNzix,
    AliceLgPix,
    AliceLgSfmix,
    AliceLgSix,
    AliceLgTopix,
    CloudflareDnsTopAses,    # seed scan over RANK edges incl. umbrella's
    CloudflareDnsTopLocations,
]

# the subset used for large-scale bench/scaling corpora (fixtures_spark.py)
BENCH_CRAWLERS = [PfxToAsn, RipeAsNames, CaidaAsRank, BgpkitAs2RelV4]

REGISTRY = {c.NAME: c for c in CRAWLER_ORDER}
