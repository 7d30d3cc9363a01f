"""Post-processing passes — second-stage derived-triple jobs over the
materialized graph (reference: iyp/post/*, run after the crawler loop,
create_db.py:191-211). Each is idempotent and rerunnable: derived triples
carry their own reference_name partition (replace semantics =
``--rerun``, iyp/__init__.py:660-687)."""

from __future__ import annotations

from .address_family import AddressFamily
from .country_information import CountryInformation
from .ip2prefix import Ip2Prefix
from .url2hostname import Url2Hostname
from .clean_links import CleanLinks

POST_ORDER = [Ip2Prefix, AddressFamily, CountryInformation, Url2Hostname, CleanLinks]
