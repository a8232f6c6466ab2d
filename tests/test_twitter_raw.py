"""S7 raw-source readers: TwitterNEED XML and NEEL TSV+gs fixtures round-trip
through the raw readers, the context-line emitter (byte-compatible with the
S5 CSV parser), and the CoNLL emitter (parsed back by the S6 reader).

No raw corpus ships in this sandbox (the real ones are fetched over the
network, S8-excluded), so the fixtures are hand-built to exercise every
reference branch: EMPTYCTXT at both edges, EMPTYCAND, gold-in/out of the
candidate list, wikipedia + dbpedia links, unresolvable links, the CoNLL
bad-index fallback, multi-word B/I spans, and the all-unresolved tweet
omission."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ed_twitter_spark.sources import twitter_raw as raw
from ed_twitter_spark.sources.twitter_eval import parse_csv_line, read_conll

WIKI = "http://en.wikipedia.org/wiki/"
DBP = "http://dbpedia.org/resource/"

TWEETS = [
    ("t1", "alpha beta gamma delta"),
    ("t2", "solo"),
    ("t3", "unknown words only here"),
    ("t4", "Big Apple thelights lights"),
]
# (tweet_id, start, end, link) char spans into the texts above
GS = [
    ("t1", 0, 5, WIKI + "Alpha_Ent"),        # EMPTYCTXT left, gold in cands
    ("t1", 11, 16, WIKI + "Gamma_Ent"),      # gold NOT in cands (-1 branch)
    ("t2", 0, 4, DBP + "Solo_Ent"),          # dbpedia + EMPTYCTXT both sides
    ("t3", 0, 7, WIKI + "Unknown_Ent"),      # mention not in KB → EMPTYCAND
    ("t3", 8, 13, "mailto:nope"),            # unresolvable link → dropped
    ("t4", 0, 9, WIKI + "NYC_Ent"),          # multi-word mention → B + I
    # span (13,19) = "lights" sits inside the word "thelights": the
    # split_in_words prefix lengths coincide (start_w == end_w == 3) and
    # the reference's fallback scan recovers the standalone "lights"
    ("t4", 13, 19, WIKI + "Lights_Ent"),
    ("t9", 0, 3, WIKI + "Ghost"),            # unknown tweet id → dropped
]


def _ent_id(name: str) -> int:
    return int(hashlib.md5(name.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def kb(spark):
    rows = [
        ("alpha", "Alpha_Ent", 0.75, 1),
        ("alpha", "Alpha_Alt", 0.25, 2),
        ("gamma", "Other_Ent", 1.0, 1),  # gold Gamma_Ent absent
        ("solo", "Solo_Ent", 1.0, 1),
        ("Big Apple", "NYC_Ent", 0.9, 1),
        ("Big Apple", "NYC_Alt", 0.1, 2),
        ("lights", "Lights_Ent", 1.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "mention string, ent_name string, prior double, rank int"
    )
    return df.withColumn("ent_id", F.conv(F.substring(F.md5("ent_name"), 1, 8), 16, 10).cast("long"))


@pytest.fixture(scope="module")
def neel_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("neel")
    with open(d / "tweets.tsv", "w") as f:
        for tid, text in TWEETS:
            f.write(f"{tid}\t{text}\n")
    with open(d / "mentions.gs", "w") as f:
        for tid, s, e, link in GS:
            f.write(f"{tid}\t{s}\t{e}\t{link}\n")
    return d


@pytest.fixture(scope="module")
def xml_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("xml")
    from xml.etree.ElementTree import Element, ElementTree, SubElement

    root = Element("Collection")
    SubElement(root, "Info")  # tweets must be the root's SECOND child
    tweets_el = SubElement(root, "Tweets")
    texts = dict(TWEETS)
    for tid, text in TWEETS:
        spans = [g for g in GS if g[0] == tid]
        tw = SubElement(tweets_el, "Tweet")
        SubElement(tw, "TweetId").text = tid
        SubElement(tw, "TweetText").text = text
        ms = SubElement(tw, "Mentions")
        for _, s, e, link in spans:
            m = SubElement(ms, "Mention")
            SubElement(m, "Text").text = text[s:e]
            SubElement(m, "StartIndx").text = str(s)
            SubElement(m, "Entity").text = link
    p = d / "tweets.xml"
    ElementTree(root).write(p)
    return p


@pytest.fixture(scope="module")
def resolved(spark, neel_dir):
    tweets = raw.read_neel_tsv(spark, str(neel_dir / "tweets.tsv"))
    gs = raw.read_neel_gs(spark, str(neel_dir / "mentions.gs"))
    return raw.resolve_links(raw.neel_mentions(tweets, gs))


def test_neel_and_xml_readers_agree(spark, neel_dir, xml_path, resolved):
    xml_m = raw.resolve_links(raw.read_twitterneed_xml(spark, str(xml_path)))
    key = ["tweet_id", "start_idx", "end_idx", "mention", "link", "ent_name"]
    # XML has no cross-file tweet lookup, so the t9 ghost row never exists
    # in either frame; the NEEL path dropped it at the join
    a = {tuple(r) for r in resolved.select(*key).collect()}
    b = {tuple(r) for r in xml_m.select(*key).collect()}
    assert a == b and len(a) == 6  # 8 gs rows − mailto dropped − ghost tweet


def test_context_lines_roundtrip_through_csv_parser(spark, resolved, kb):
    lines = {
        (r["tweet_id"], r["m_ord"]): r["line"]
        for r in raw.mention_context_lines(resolved, kb).collect()
    }
    assert len(lines) == 6

    parsed = {k: parse_csv_line(v, 0) for k, v in lines.items()}
    # gold in candidates: GT pos 1, not NIL
    (_, _, _, mention, lctx, rctx, names, priors, gold, nil) = parsed[("t1", 0)]
    assert mention == "alpha" and lctx == "EMPTYCTXT" and rctx == "beta gamma delta"
    assert names == ["Alpha_Ent", "Alpha_Alt"] and priors == [0.75, 0.25]
    assert gold == "Alpha_Ent" and nil == 0
    assert lines[("t1", 0)].split("\t")[-1].startswith("1,")
    # gold not in candidate list → GT: -1,<id>,<name> (NIL-marked)
    (_, _, _, mention, _, _, names, _, gold, nil) = parsed[("t1", 1)]
    assert mention == "gamma" and names == ["Other_Ent"]
    assert gold == "Gamma_Ent" and nil == 1
    # dbpedia link + both contexts empty
    (_, _, _, mention, lctx, rctx, _, _, gold, nil) = parsed[("t2", 0)]
    assert (mention, lctx, rctx, gold, nil) == ("solo", "EMPTYCTXT", "EMPTYCTXT", "Solo_Ent", 0)
    # mention missing from the KB → EMPTYCAND
    line = lines[("t3", 0)]
    assert "\tEMPTYCAND\tGT:\t-1," in line
    (_, _, _, _, _, _, names, priors, gold, nil) = parsed[("t3", 0)]
    assert names == [] and priors == [] and gold == "Unknown_Ent" and nil == 1
    # candidate id strings carry the deterministic md5 ids
    assert str(_ent_id("Alpha_Ent")) in lines[("t1", 0)]


def test_conll_roundtrip_through_s6_reader(spark, resolved, tmp_path):
    out = raw.conll_lines(resolved).orderBy("tweet_id", "seq").collect()
    text = "\n".join(r["line"] for r in out) + "\n"
    p = tmp_path / "raw.conll"
    p.write_text(text)

    docs = {}
    for r in read_conll(spark, str(p)).collect():
        docs.setdefault(r["doc_id"], r)

    # t3: its only resolvable mention is EMPTYCAND but still tagged; t9 absent
    assert set(docs) == {"t1", "t2", "t3", "t4"}
    # t4: "Big Apple" spans words 0-2 (B + I), bad-index "lights" recovered
    # at word 3 by the fallback scan (word 2 is "thelights", untagged)
    t4 = docs["t4"]
    spans = sorted(zip(t4["m_starts"], t4["m_ends"]))
    assert spans == [(0, 2), (3, 4)]
    # t1: two single-word spans at word offsets 0 and 2
    t1 = docs["t1"]
    assert sorted(zip(t1["m_starts"], t1["m_ends"])) == [(0, 1), (2, 3)]
    # wikilinks survive into the CoNLL columns
    assert any(WIKI in (r["line"] or "") for r in out)
