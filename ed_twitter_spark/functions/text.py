"""Scalar text operators (SURVEY.md §2.2 P1-P5, §2.8).

All are pure and deterministic; the Spark path applies them either as
built-in column expressions (JVM-side, preferred) or inside Arrow-batched
pandas UDFs (never per-row Python UDFs). Reference cites:

* tokenizer: ``RegexpTokenizer(r'\\w+')`` + unidecode transliteration,
  `deep-ed-pytorch/utils/utils.py:24-26`. We vendor a small ASCII fold
  table instead of the unidecode package (not installed here).
* stopword/number filter (`is_important_word`): `mulrel-nel/nel/utils.py:44-52`.
* entity-name normalization: `ent_name_id.py:105-115`.
* mention normalization (`preprocess_mention`): `yago_crosswikis_wiki.py:82-95`.
* uppercase-phrase title-casing: `utils/utils.py:17-21`.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- stopword list (public list shipped with mulrel-nel, nel/utils.py:7-41) --
STOPWORDS = frozenset(
    """a about above across after afterwards again against all almost alone along
already also although always am among amongst amoungst amount an and another any
anyhow anyone anything anyway anywhere are around as at back be became because
become becomes becoming been before beforehand behind being below beside besides
between beyond both bottom but by call can cannot cant dont co con could couldnt
cry de describe detail do done down due during each eg eight either eleven else
elsewhere empty enough etc even ever every everyone everything everywhere except
few fifteen fify fill find fire first five for former formerly forty found four
from front full further get give go had has hasnt have he hence her here
hereafter hereby herein hereupon hers herself him himself his how however hundred
i ie if in inc indeed interest into is it its itself keep last latter latterly
least less ltd made many may me meanwhile might mill mine more moreover most
mostly move much must my myself name namely neither never nevertheless next nine
no nobody none noone nor not nothing now nowhere of off often on once one only
onto or other others otherwise our ours ourselves out over own part per perhaps
please put rather re same see seem seemed seeming seems serious several she
should show side since sincere six sixty so some somehow someone something
sometime sometimes somewhere still such system take ten than that the their them
themselves then thence there thereafter thereby therefore therein thereupon
these they thick thin third this those though three through throughout thru thus
to together too top toward towards twelve twenty two un under until up upon us
very via was we well were what whatever when whence whenever where whereafter
whereas whereby wherein whereupon wherever whether which while whither who
whoever whole whom whose why will with within without would yet you your yours
yourself yourselves st years new used known year later including end did just
best using""".split()
)

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# Minimal deterministic ASCII fold for the Latin-1 range (stand-in for
# unidecode; identical output for pure-ASCII input, which is what both the
# synthetic corpus and the Twitter eval set are overwhelmingly made of).
_TRANSLIT_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_TRANSLIT_DST = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"
_TRANSLIT = str.maketrans(_TRANSLIT_SRC, _TRANSLIT_DST)


def split_in_words(s: str) -> list[str]:
    """P3 tokenizer: \\w+ token spans, transliterated."""
    return [w.translate(_TRANSLIT) for w in _WORD_RE.findall(s or "")]


def is_important_word(s: str) -> bool:
    """P4: not a stopword, not a number, len > 1 (nel/utils.py:44-52)."""
    if s is None or len(s) <= 1 or s.lower() in STOPWORDS:
        return False
    try:
        float(s)
        return False
    except ValueError:
        return True


def first_letter_to_uppercase(s: str) -> str:
    if len(s) < 1:
        return s
    return s[0].upper() + s[1:]


def modify_uppercase_phrase(s: str) -> str:
    """All-caps phrases get title-cased, others pass through (utils.py:17-21)."""
    return s.title() if s == s.upper() else s


def preprocess_ent_name(name: str, redirects: dict[str, str] | None = None) -> str:
    """P1 entity-name normalization (ent_name_id.py:105-115)."""
    n = name.strip().replace("&amp;", "&").replace("&quot;", '"').replace("_", " ")
    n = first_letter_to_uppercase(n)
    if redirects:
        n = redirects.get(n, n)
    return n


def preprocess_mention(
    m: str,
    total_freq: dict[str, int],
    lower_to_upper: dict[str, str],
    known: set[str] | None = None,
) -> str:
    """P2 mention normalization with frequency tie-break
    (yago_crosswikis_wiki.py:82-95). ``known`` is the alias-table key set
    (defaults to total_freq's keys)."""
    known = known if known is not None else total_freq.keys()
    cur = modify_uppercase_phrase(m)
    if cur not in known:
        cur = m
    if total_freq.get(m, 0) > total_freq.get(cur, 0):
        cur = m
    if cur not in known and cur.lower() in lower_to_upper:
        cur = lower_to_upper[cur.lower()]
    return cur


# --- Spark column twins (JVM-side, used in the hot path) --------------------


def tokens_col(text: Column) -> Column:
    """JVM-side \\w+ tokenizer: returns array<string> (P3 without translit —
    the transliteration pandas UDF is applied only when non-ASCII survives)."""
    return F.filter(
        F.split(F.regexp_replace(text, r"\W+", " "), " "), lambda t: t != ""
    )


def important_filter_col(toks: Column) -> Column:
    """P4 as a JVM array filter: len>1, not numeric, not stopword."""
    sw = F.lit(sorted(STOPWORDS)).cast("array<string>")
    return F.filter(
        toks,
        lambda t: (F.length(t) > 1)
        & ~F.array_contains(sw, F.lower(t))
        & F.lower(t).cast("double").isNull(),
    )
