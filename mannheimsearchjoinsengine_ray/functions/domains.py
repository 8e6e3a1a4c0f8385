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


# --- reversible URL compression (DomainUtils.compress/uncompress,
# :34-70 + reductionMap :187-1196) ---
# The reference's scheme: strip "http://" entirely, "https://" → "s:",
# a leading "www" → "w:", then substitute the pay-level domain with a
# "#NNN#" token from a top-popular-PLD table (their map: the top-1000 PLDs
# of their crawl, ~9 % of vertices).  Mechanism kept exactly (incl. the
# bare-"www" prefix replacement quirk); the table below is OUR OWN data — a
# list of globally popular websites (public knowledge), extensible exactly
# like the reference's map.

_POPULAR_PLDS: list[str] = """
google.com youtube.com facebook.com wikipedia.org instagram.com twitter.com
x.com reddit.com amazon.com yahoo.com whatsapp.com tiktok.com bing.com
linkedin.com pinterest.com netflix.com microsoft.com apple.com live.com
office.com ebay.com twitch.tv fandom.com imdb.com github.com stackoverflow.com
wordpress.com wordpress.org tumblr.com flickr.com vimeo.com medium.com
quora.com paypal.com dropbox.com adobe.com spotify.com soundcloud.com
etsy.com craigslist.org walmart.com target.com bestbuy.com aliexpress.com
alibaba.com booking.com airbnb.com tripadvisor.com expedia.com hotels.com
yelp.com zillow.com indeed.com glassdoor.com salesforce.com zoom.us
slack.com discord.com telegram.org signal.org mozilla.org archive.org
nytimes.com theguardian.com bbc.co.uk bbc.com cnn.com reuters.com
bloomberg.com forbes.com wsj.com washingtonpost.com huffpost.com npr.org
foxnews.com usatoday.com time.com economist.com ft.com aljazeera.com
dw.com spiegel.de zeit.de faz.net welt.de bild.de sueddeutsche.de heise.de
lemonde.fr lefigaro.fr liberation.fr elpais.com elmundo.es corriere.it
repubblica.it asahi.com yomiuri.co.jp nhk.or.jp xinhuanet.com qq.com
baidu.com weibo.com zhihu.com bilibili.com douban.com taobao.com jd.com
sina.com.cn sohu.com 163.com naver.com daum.net kakao.com yandex.ru
mail.ru vk.com ok.ru rambler.ru wiktionary.org wikimedia.org wikihow.com
britannica.com merriam-webster.com dictionary.com thefreedictionary.com
thesaurus.com urbandictionary.com goodreads.com gutenberg.org arxiv.org
nature.com sciencedirect.com springer.com wiley.com jstor.org
researchgate.net academia.edu scholar.google.com nih.gov cdc.gov who.int
un.org europa.eu nasa.gov noaa.gov weather.com accuweather.com espn.com
sports.yahoo.com bleacherreport.com skysports.com goal.com fifa.com
uefa.com nba.com nfl.com mlb.com nhl.com f1.com cricbuzz.com espncricinfo.com
rottentomatoes.com metacritic.com ign.com gamespot.com kotaku.com
polygon.com steampowered.com epicgames.com roblox.com minecraft.net
ea.com ubisoft.com nintendo.com playstation.com xbox.com
cnet.com techcrunch.com theverge.com wired.com arstechnica.com engadget.com
gizmodo.com mashable.com zdnet.com tomshardware.com anandtech.com
hackernews.com ycombinator.com slashdot.org sourceforge.net gitlab.com
bitbucket.org npmjs.com pypi.org docker.com kubernetes.io apache.org
python.org ruby-lang.org golang.org rust-lang.org java.com oracle.com
ibm.com intel.com amd.com nvidia.com cisco.com dell.com hp.com lenovo.com
samsung.com lg.com sony.com panasonic.com philips.com siemens.com
bosch.com tesla.com toyota.com honda.com ford.com bmw.com mercedes-benz.com
volkswagen.com audi.com hyundai.com nissan.com ferrari.com porsche.com
booking.hu skyscanner.net kayak.com ryanair.com easyjet.com lufthansa.com
britishairways.com airfrance.com klm.com emirates.com qatarairways.com
delta.com united.com southwest.com marriott.com hilton.com ihg.com
accor.com hostelworld.com agoda.com trivago.com momondo.com rome2rio.com
flightaware.com openstreetmap.org mapquest.com here.com waze.com
uber.com lyft.com doordash.com grubhub.com deliveroo.com justeat.com
instacart.com shopify.com squarespace.com wix.com weebly.com godaddy.com
namecheap.com cloudflare.com akamai.com fastly.com heroku.com netlify.com
vercel.com digitalocean.com linode.com ovh.com hetzner.com
typepad.com blogspot.com blogger.com livejournal.com substack.com
patreon.com kickstarter.com indiegogo.com gofundme.com change.org
surveymonkey.com typeform.com mailchimp.com hubspot.com zendesk.com
atlassian.com trello.com asana.com notion.so airtable.com figma.com
canva.com behance.net dribbble.com deviantart.com artstation.com
unsplash.com pexels.com pixabay.com shutterstock.com gettyimages.com
istockphoto.com giphy.com imgur.com 9gag.com knowyourmeme.com
buzzfeed.com vice.com vox.com theatlantic.com newyorker.com politico.com
axios.com thehill.com breitbart.com dailymail.co.uk mirror.co.uk
telegraph.co.uk independent.co.uk standard.co.uk metro.co.uk thesun.co.uk
express.co.uk sky.com itv.com channel4.com rte.ie abc.net.au smh.com.au
theage.com.au news.com.au nzherald.co.nz stuff.co.nz cbc.ca ctvnews.ca
globalnews.ca theglobeandmail.com nationalpost.com torontosun.com
timesofindia.com hindustantimes.com ndtv.com thehindu.com indianexpress.com
scmp.com straitstimes.com channelnewsasia.com bangkokpost.com
japantimes.co.jp koreatimes.co.kr koreaherald.com jpost.com haaretz.com
hurriyet.com.tr sabah.com.tr folha.uol.com.br globo.com clarin.com
lanacion.com.ar eluniversal.com.mx milenio.com emol.com latercera.com
""".split()

reduction_map: dict[str, str] = {
    pld: f"#{i:03d}#" for i, pld in enumerate(_POPULAR_PLDS)
}
inv_reduction_map: dict[str, str] = {v: k for k, v in reduction_map.items()}

_ABBR_RE = re.compile(r".*(#\d\d\d#).*")


def compress_url(url: str) -> str:
    """DomainUtils.compress (:55-69): scheme prefixes shrink to s:/w:, the
    pay-level domain shrinks to its #NNN# token when popular."""
    pld = get_pay_level_domain(url)
    if url.startswith("http://"):
        url = url[len("http://"):]
    if url.startswith("https://"):
        url = "s:" + url[len("https://"):]
    if url.startswith("www") or url.startswith("s:www"):
        url = url.replace("www", "w:", 1)
    if pld in reduction_map:
        url = url.replace(pld, reduction_map[pld])
    return url


def uncompress_url(url: str) -> str:
    """DomainUtils.uncompress (:34-52) — exact inverse of compress."""
    m = _ABBR_RE.match(url)
    if m and m.group(1) in inv_reduction_map:
        url = url.replace(m.group(1), inv_reduction_map[m.group(1)])
    if url.startswith("s:w:"):
        url = "https://www" + url[len("s:w:"):]
    elif url.startswith("s:"):
        url = "https://" + url[len("s:"):]
    elif url.startswith("w:"):
        url = "http://www" + url[len("w:"):]
    else:
        url = "http://" + url
    return url
