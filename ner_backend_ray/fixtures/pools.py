"""Deterministic per-label surface pools and sentence templates.

Mirrors the role of the reference's TagInfo example pools
(internal/core/types/tag_metadata.go:10-160): every label the reference emits
(internal/core/onnx.go:33-38) has a pool of example surfaces, and page bodies are
assembled from templates over those pools so ground truth (exact byte offsets and
expected triples) is known by construction (FIXTURES.md §1.1).

Formats are chosen so the validator chain (postprocess.go) keeps them: phones are
single tokens with 7-15 digits, SSNs are XXX-XX-XXXX, cards are Luhn-valid 4x4
groups with single-space gaps (FilterEntities run-merging + coalesce apply).
"""

from __future__ import annotations

from functools import lru_cache

FIRST_NAMES = [
    "Leo", "Sonia", "Marcus", "Elena", "Priya", "Hiro", "Amara", "Dmitri",
    "Ingrid", "Tomas", "Yusuf", "Clara", "Ravi", "Beatriz", "Nolan", "Freya",
    "Omar", "Lucia", "Anders", "Mei", "Jorge", "Katya", "Samuel", "Aisha",
    "Pierre", "Noor", "Viktor", "Hana", "Diego", "Saoirse",
    "José", "François", "Müller", "Søren", "Žofia",
]
LAST_NAMES = [
    "Morgan", "Whitfield", "Okafor", "Lindqvist", "Deshpande", "Tanaka",
    "Abimbola", "Volkov", "Johansson", "Novak", "Rahman", "Beaumont",
    "Iyer", "Camargo", "Fitzgerald", "Dahl", "Haddad", "Moreno", "Nilsen",
    "Zhang", "Alvarez", "Petrova", "Ostrowski", "Khan", "Durand", "Farouk",
    "Sokolov", "Kimura", "Vargas", "Gallagher",
]
COMPANY_HEADS = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Wonka",
    "Tyrell", "Cyberdyne", "Oscorp", "Nakatomi", "Vandelay", "Prestige",
    "Pinnacle", "Vertex", "Quantum", "Helix", "Zenith", "Aurora", "Catalyst",
]
COMPANY_TAILS = ["Corp", "Inc", "Ltd", "Holdings", "Labs", "Systems", "Industries", "Group"]
LOCATIONS = [
    "Boston", "Lisbon", "Nairobi", "Osaka", "Krakow", "Medellin", "Tallinn",
    "Adelaide", "Rotterdam", "Casablanca", "Vancouver", "Tbilisi", "Cusco",
    "Galway", "Sapporo", "Valparaiso", "Ljubljana", "Windhoek", "Bergen",
    "Haiphong", "Zürich", "Kraków", "Reykjavík", "São Paulo",
]
STREET_NAMES = [
    "Maple", "Juniper", "Harrow", "Caldwell", "Birchwood", "Ellsworth",
    "Fenwick", "Granville", "Holloway", "Iverson",
]
STREET_SUFFIXES = ["Street", "Avenue", "Boulevard", "Lane", "Drive"]
EMAIL_DOMAINS = ["example.net", "mailhub.io", "postbox.org", "corpmail.com", "webmsg.dev"]
URL_HOSTS = ["news-portal.com", "dataforge.io", "openarchive.org", "docs-center.net", "devhub.dev"]

GENDERS = ["male", "female", "nonbinary"]
ETHNICITIES = ["hispanic", "caucasian", "asian"]
ORIENTATIONS = ["heterosexual", "bisexual", "gay"]
SERVICE_CODES = ["SVC-0017", "SVC-0042", "SVC-0099"]

# Filler vocabulary — everyday words kept disjoint from all entity pools.
O_WORDS = (
    "the quick brown fox jumps over lazy dog while morning light settles "
    "across quiet rooftops and distant hills where travelers pause to rest "
    "their weary feet beside clear streams that wind through mossy valleys "
    "carrying whispers of old stories told by patient voices under summer "
    "skies full of drifting clouds and slow birds circling high above green "
    "meadows dotted with small flowers swaying gently in warm afternoon air"
).split()

# Non-slot template words must be O for the tagger; collected into o_vocab.
TEMPLATE_WORDS = (
    "Contact at or works in is based lives was born on visited My credit "
    "score and rising Card SSN file Visit for details Vehicle with plate "
    "Customer id updated this a custom token form listed now call reach "
    "their record shows").split()


def _names() -> list[str]:
    return [f"{FIRST_NAMES[i % len(FIRST_NAMES)]} {LAST_NAMES[(i * 7 + i // len(FIRST_NAMES)) % len(LAST_NAMES)]}"
            for i in range(120)]


def _companies() -> list[str]:
    return [f"{COMPANY_HEADS[i % len(COMPANY_HEADS)]} {COMPANY_TAILS[(i * 3 + i // len(COMPANY_HEADS)) % len(COMPANY_TAILS)]}"
            for i in range(80)]


def _luhn_checkdigit(digits15: str) -> str:
    # compute the 16th digit so the full number passes Luhn
    total = 0
    for i, ch in enumerate(digits15):
        d = int(ch)
        if i % 2 == 0:  # positions 0,2,.. of a 16-digit number are doubled
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return str((10 - total % 10) % 10)


@lru_cache(maxsize=1)
def entity_pools() -> dict[str, list[str]]:
    names = _names()
    companies = _companies()
    addresses = [f"{10000 + (i * 937) % 80000} {STREET_NAMES[i % len(STREET_NAMES)]} "
                 f"{STREET_SUFFIXES[i % len(STREET_SUFFIXES)]}" for i in range(60)]
    emails = []
    for i in range(100):
        n = names[i % len(names)].split()
        local = ".".join(p.lower().encode("ascii", "ignore").decode("ascii") or "user" for p in n)
        emails.append(f"{local}{i % 10}@{EMAIL_DOMAINS[i % len(EMAIL_DOMAINS)]}")
    phones = []
    for i in range(80):
        a, b, c = 201 + (i * 13) % 700, 100 + (i * 37) % 900, 1000 + (i * 271) % 9000
        if i % 3 == 0:
            phones.append(f"{a:03d}-{b:03d}-{c:04d}")
        elif i % 3 == 1:
            phones.append(f"+1-{a:03d}-{b:03d}-{c:04d}")
        else:
            phones.append(f"{a:03d}.{b:03d}.{c:04d}")
    ssns = [f"{100 + (i * 53) % 800:03d}-{10 + (i * 7) % 89:02d}-{1000 + (i * 431) % 9000:04d}"
            for i in range(60)]
    cards = []
    for i in range(40):
        head = "4" + f"{(i * 811) % 10**14:014d}"  # 15 digits starting with 4
        full = head + _luhn_checkdigit(head)
        cards.append(" ".join(full[j:j + 4] for j in range(0, 16, 4)))
    scores = [str(300 + (i * 41) % 551) for i in range(40)]
    dates_iso = [f"{1960 + (i * 7) % 60}-{1 + (i * 5) % 12:02d}-{1 + (i * 11) % 28:02d}"
                 for i in range(60)]
    urls = [f"https://www.{URL_HOSTS[i % len(URL_HOSTS)]}/item-{i}" for i in range(50)]
    vins = []
    alphabet = "ABCDEFGHJKLMNPRSTUVWXYZ0123456789"
    for i in range(30):
        vins.append("".join(alphabet[(i * 7 + j * 13) % len(alphabet)] for j in range(17)))
    plates = [f"{chr(65 + i % 26)}{chr(65 + (i * 3) % 26)}{chr(65 + (i * 7) % 26)}-{1000 + (i * 97) % 9000}"
              for i in range(30)]
    id_numbers = [f"P{10000000 + (i * 5237) % 89999999:08d}" for i in range(30)]

    return {
        "NAME": names,
        "COMPANY": companies,
        "LOCATION": list(LOCATIONS),
        "ADDRESS": addresses,
        "EMAIL": emails,
        "PHONENUMBER": phones,
        "SSN": ssns,
        "CARD_NUMBER": cards,
        "CREDIT_SCORE": scores,
        "DATE": dates_iso,
        "URL": urls,
        "VIN": vins,
        "LICENSE_PLATE": plates,
        "ID_NUMBER": id_numbers,
        "GENDER": list(GENDERS),
        "ETHNICITY": list(ETHNICITIES),
        "SEXUAL_ORIENTATION": list(ORIENTATIONS),
        "SERVICE_CODE": list(SERVICE_CODES),
    }


@lru_cache(maxsize=1)
def tagger_vocab() -> list[tuple[str, str]]:
    """(surface, label) pairs the hash tagger trains on — every pool surface."""
    vocab: list[tuple[str, str]] = []
    for label, surfaces in entity_pools().items():
        for s in surfaces:
            vocab.append((s, label))
    return vocab


@lru_cache(maxsize=1)
def o_vocab() -> list[str]:
    return sorted(set(O_WORDS) | set(TEMPLATE_WORDS))
