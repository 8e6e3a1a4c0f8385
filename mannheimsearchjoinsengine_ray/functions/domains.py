"""URL → domain utilities.

Behavioral port of SJ/utils/DomainUtils.java:34-186 (pay-level domain, TLD,
subdomain; reversible URL compression).  The reference uses Guava's
InternetDomainName over the full public-suffix list plus two ~1000-entry
abbreviation maps; we ship a compact public-suffix subset (extend
``_PUBLIC_SUFFIXES`` as data, exactly like the reference's data maps) and a
deterministic dictionary-free compression scheme.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

# Compact public-suffix set: common gTLDs + ccTLDs + frequent 2-level suffixes.
_PUBLIC_SUFFIXES = frozenset(
    """
    com org net edu gov mil int info biz name mobi tel travel jobs cat asia
    arpa aero coop museum pro xxx io ai app dev co us uk de fr it es nl be at
    ch se no dk fi pl cz ru ua jp cn kr in au nz br mx ar cl ca gr pt hu ro
    bg sk si hr rs ba mk al tr il sa ae eg za ng ke ma tn id my sg th vn ph
    co.uk org.uk ac.uk gov.uk me.uk net.uk co.jp ne.jp or.jp ac.jp go.jp
    com.au net.au org.au edu.au gov.au com.br net.br org.br gov.br com.cn
    net.cn org.cn gov.cn com.mx com.ar com.tr com.sg com.my co.in co.nz
    co.za co.kr ac.at or.at gv.at co.at
    """.split()
)

_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.-]*://", re.I)


def get_host(url: str) -> str:
    """Hostname of a URL (scheme optional), lowercased, port stripped."""
    if not _SCHEME_RE.match(url):
        url = "http://" + url
    host = urlsplit(url).hostname or ""
    return host.lower().rstrip(".")


def get_public_suffix(host: str) -> str:
    """Longest matching public suffix of a hostname ('' if none known)."""
    labels = host.split(".")
    for i in range(len(labels) - 2, -1, -1):
        cand = ".".join(labels[i:])
        if cand not in _PUBLIC_SUFFIXES:
            # the suffix is the part after this label (may be '')
            return ".".join(labels[i + 1:])
    return host if host in _PUBLIC_SUFFIXES else (
        ".".join(labels[1:]) if len(labels) > 1 and ".".join(labels[1:]) else ""
    )


def get_top_level_domain(url: str) -> str:
    """TLD of the URL's host (rightmost public-suffix match), e.g. 'co.uk'."""
    host = get_host(url)
    labels = host.split(".")
    best = ""
    for i in range(len(labels)):
        cand = ".".join(labels[i:])
        if cand in _PUBLIC_SUFFIXES:
            best = cand
            break
    return best or (labels[-1] if labels else "")


def get_pay_level_domain(url: str) -> str:
    """Registrable domain: one label below the public suffix
    ('a.b.example.co.uk' → 'example.co.uk')."""
    host = get_host(url)
    tld = get_top_level_domain(url)
    if not tld or host == tld:
        return host
    prefix = host[: -(len(tld) + 1)]
    if not prefix:
        return host
    last = prefix.rsplit(".", 1)[-1]
    return f"{last}.{tld}"


def get_sub_domain(url: str) -> str:
    """Everything below the pay-level domain ('' when none)."""
    host = get_host(url)
    pld = get_pay_level_domain(url)
    if host == pld or not pld:
        return ""
    return host[: -(len(pld) + 1)]


# --- reversible URL compression (DomainUtils.compress/uncompress analog) ---
# The reference substitutes frequent substrings through two static maps; we use
# a fixed, order-sensitive substitution table (applied longest-first on
# compress, reverse order on uncompress) — deterministic and reversible as
# long as the escape token '~' is first.

_COMPRESSION_TABLE: list[tuple[str, str]] = [
    ("~", "~~"),               # escape
    ("http://www.", "~0"),
    ("https://www.", "~1"),
    ("http://", "~2"),
    ("https://", "~3"),
    (".com/", "~4"),
    (".org/", "~5"),
    (".net/", "~6"),
    (".html", "~7"),
    ("index", "~8"),
    ("/page", "~9"),
]


def compress_url(url: str) -> str:
    for plain, short in _COMPRESSION_TABLE:
        url = url.replace(plain, short)
    return url


def uncompress_url(url: str) -> str:
    for plain, short in reversed(_COMPRESSION_TABLE):
        url = url.replace(short, plain)
    return url
