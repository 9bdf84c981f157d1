"""Entity linking: exact path (ambiguity resolution) + fuzzy path
(MinHash-LSH blocked, n-gram re-ranked)."""

from pyspark.sql import functions as F

from kbase_cdm_ontologies_spark.operators.alias_dict import (
    build_alias_dict,
    with_candidate_counts,
)
from kbase_cdm_ontologies_spark.operators.linking import (
    fuzzy_candidates,
    fuzzy_link_best,
)


def test_ambiguous_alias_resolved_by_context(spark, corpus, corpus_dfs):
    """The 'omega factor' fixture: pages mentioning it must link to the
    term whose ontology dominates the page context (oracle rule)."""
    amb = {
        (u, s, p, o)
        for (u, s, p, o) in corpus.expected_linked
        if s.endswith("0000010") or o.endswith("0000010")
    }
    # covered in the e2e suite; here just assert the fixture exists
    # in at least one page so the rule is actually exercised
    assert any("omega factor" in pg["text"] for pg in corpus.pages)
    _ = amb


def test_fuzzy_candidates_find_typos(spark, corpus_dfs):
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    real = [r["alias_norm"] for r in alias.limit(5).collect()]
    # introduce character-level typos: swap two middle characters
    def typo(s):
        mid = len(s) // 2
        return s[: mid - 1] + s[mid] + s[mid - 1] + s[mid + 1 :]

    surfaces = spark.createDataFrame(
        [(typo(a),) for a in real] + [("zzzz qqqq",)], ["surface_norm"]
    )
    best = {
        r["surface_norm"]: r["term_id"]
        for r in fuzzy_link_best(surfaces, alias, min_jaccard=0.3).collect()
    }
    amap = {r["alias_norm"]: r["term_id"] for r in alias.collect()}
    hits = sum(1 for a in real if best.get(typo(a)) == amap[a])
    assert hits >= 4  # typo'd surfaces link back to their true term
    assert "zzzz qqqq" not in best  # garbage stays unlinked


def test_fuzzy_exact_surface_scores_one(spark, corpus_dfs):
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    a0 = alias.first()["alias_norm"]
    surfaces = spark.createDataFrame([(a0,)], ["surface_norm"])
    cand = fuzzy_candidates(surfaces, alias).collect()
    exact = [r for r in cand if r["alias_norm"] == a0]
    assert exact and abs(exact[0]["sim"] - 1.0) < 1e-9


def test_tfidf_context_rerank_disambiguates(spark):
    """TF-IDF strategy: the shared alias 'omega factor' must resolve to
    the term whose OTHER aliases overlap the page text."""
    from kbase_cdm_ontologies_spark.operators.linking import (
        link_triples_tfidf,
        tfidf_context_scores,
    )

    alias = spark.createDataFrame(
        [
            ("AAA:1", "omega factor", 2, "AAA"),
            ("BBB:1", "omega factor", 2, "BBB"),
            ("AAA:1", "alpha kinase", 1, "AAA"),
            ("BBB:1", "beta channel", 1, "BBB"),
        ],
        ["term_id", "alias_norm", "n_candidates", "source_onto"],
    )
    extracted = spark.createDataFrame(
        [
            ("u1", "the omega factor binds the alpha kinase pathway"),
            ("u2", "omega factor opens the beta channel gate"),
        ],
        ["url", "extracted_text"],
    )
    triples = spark.createDataFrame(
        [
            ("u1", "omega factor", "kg:activates", "alpha kinase"),
            ("u2", "omega factor", "kg:activates", "beta channel"),
        ],
        ["url", "subj_surface", "pred", "obj_surface"],
    )
    got = {
        (r["url"], r["subj_id"], r["obj_id"])
        for r in link_triples_tfidf(triples, alias, extracted).collect()
    }
    assert got == {("u1", "AAA:1", "AAA:1"), ("u2", "BBB:1", "BBB:1")}
    # score surface: candidate pairs get comparable scores, right one wins
    cand = spark.createDataFrame(
        [("u1", "AAA:1"), ("u1", "BBB:1")], ["url", "term_id"]
    )
    s = {
        r["term_id"]: r["tfidf_cosine"]
        for r in tfidf_context_scores(
            extracted, alias.select("term_id", "alias_norm"), cand
        ).collect()
    }
    assert s["AAA:1"] > s["BBB:1"]


# ----------------------------------------------- adversarial fixture

def _adversarial_linking_fixture(spark, seed=1234, n_pages=120):
    """Controlled-ambiguity linking corpus (FIXTURES.md §'adversarial
    linking'): 3 ontologies × 24 terms; 12 aliases shared across
    ontologies (2-3 candidates each), ONE hub alias shared by all
    three ontologies and mentioned on most pages (skew), per-page
    typo'd surfaces, and pages with a contaminated context (an alias
    from a non-dominant ontology). Gold links are known by
    construction: an ambiguous surface's true term is the candidate
    from the page's dominant ontology."""
    import random

    rng = random.Random(seed)
    ontos = ["AAA", "BBB", "CCC"]
    words = [
        "alpha", "beta", "gamma", "delta", "kappa", "sigma", "omega",
        "zeta", "theta", "lambda", "micro", "nano",
    ]
    nouns = ["factor", "channel", "kinase", "receptor", "domain", "complex"]
    alias_rows = []  # (term_id, alias_norm, source_onto)
    unique_aliases = {o: [] for o in ontos}  # onto -> [(alias, term)]
    # unique aliases: one per term, flavored by ontology so TF-IDF has
    # signal; plus 12 ambiguous aliases shared by one term per ontology
    for oi, o in enumerate(ontos):
        for t in range(24):
            tid = f"{o}:{t:07d}"
            a = f"{o.lower()} {words[t % len(words)]} {nouns[(t // len(words)) % len(nouns)]} {t}"
            alias_rows.append((tid, a, o))
            unique_aliases[o].append((a, tid))
    amb_aliases = []  # (alias, {onto: term})
    for k in range(12):
        a = f"shared {words[k % len(words)]} {nouns[k % len(nouns)]}"
        owners = {}
        for o in ontos[: 2 + k % 2]:  # 2 or 3 candidates
            tid = f"{o}:{k:07d}"
            alias_rows.append((tid, a, o))
            owners[o] = tid
        amb_aliases.append((a, owners))
    hub_alias = "universal marker"  # the skew hub: 3 candidates, most pages
    hub_owners = {}
    for o in ontos:
        tid = f"{o}:{23:07d}"
        alias_rows.append((tid, hub_alias, o))
        hub_owners[o] = tid

    pages, mentions, triples, gold, typo_gold = [], [], [], [], []
    for p in range(n_pages):
        url = f"https://example.org/adv{p:04d}"
        dom = ontos[p % 3]
        ctx = rng.sample(unique_aliases[dom], 4)  # dominant context
        surfaces = [a for a, _t in ctx]
        # contaminate 40% of pages with one foreign unambiguous alias
        if p % 5 in (0, 1):
            other = ontos[(p + 1) % 3]
            surfaces.append(rng.choice(unique_aliases[other])[0])
        amb_a, amb_owners = amb_aliases[p % len(amb_aliases)]
        if dom not in amb_owners:  # ensure a dominant candidate exists
            for a2, o2 in amb_aliases:
                if dom in o2:
                    amb_a, amb_owners = a2, o2
                    break
        surfaces.append(amb_a)
        surfaces.append(hub_alias)
        for s in surfaces:
            mentions.append((url, s))
        pages.append((url, " and ".join(surfaces) + "."))
        # triples: ambiguous subj × unique obj, hub subj × unique obj
        obj_a, obj_t = ctx[0]
        triples.append((url, amb_a, "kg:related_to", obj_a))
        gold.append((url, amb_owners[dom], "kg:related_to", obj_t))
        triples.append((url, hub_alias, "kg:part_of", obj_a))
        gold.append((url, hub_owners[dom], "kg:part_of", obj_t))
        # a typo'd surface of a dominant unique alias (middle-char swap)
        ta, tt = ctx[1]
        mid = len(ta) // 2
        typo = ta[: mid - 1] + ta[mid] + ta[mid - 1] + ta[mid + 1:]
        typo_gold.append((typo, tt))

    alias = with_candidate_counts(
        spark.createDataFrame(alias_rows, ["term_id", "alias_norm", "source_onto"])
    )
    return dict(
        alias=alias,
        mentions=spark.createDataFrame(mentions, ["url", "alias_norm"]),
        pages=spark.createDataFrame(pages, ["url", "extracted_text"]),
        triples=spark.createDataFrame(
            triples, ["url", "subj_surface", "pred", "obj_surface"]
        ),
        gold=set(gold),
        typo_gold=typo_gold,
    )


def _link_pr(got: set, gold: set) -> tuple[float, float]:
    tp = len(got & gold)
    return tp / max(len(got), 1), tp / max(len(gold), 1)


def test_adversarial_context_linking_pr(spark):
    """Link-level P/R of the exact path (page-context disambiguation)
    under shared aliases, a 3-way hub alias on every page, and
    contaminated contexts: both must clear 0.9 (they are 1.0 on this
    fixture — the dominant context always outvotes one contaminant)."""
    from kbase_cdm_ontologies_spark.operators.linking import link_triples

    fx = _adversarial_linking_fixture(spark)
    got = {
        (r["url"], r["subj_id"], r["pred"], r["obj_id"])
        for r in link_triples(fx["triples"], fx["alias"], fx["mentions"]).collect()
    }
    p, r = _link_pr(got, fx["gold"])
    assert p >= 0.9 and r >= 0.9, (p, r)


def test_adversarial_tfidf_linking_pr(spark):
    """Same fixture through the TF-IDF cosine re-ranker (no mention
    context, only page text vs candidate alias bags)."""
    from kbase_cdm_ontologies_spark.operators.linking import link_triples_tfidf

    fx = _adversarial_linking_fixture(spark)
    got = {
        (r["url"], r["subj_id"], r["pred"], r["obj_id"])
        for r in link_triples_tfidf(fx["triples"], fx["alias"], fx["pages"]).collect()
    }
    p, r = _link_pr(got, fx["gold"])
    assert p >= 0.9 and r >= 0.9, (p, r)


def test_adversarial_fuzzy_typos_pr(spark):
    """Typo'd surfaces (middle-char swap of real aliases) through the
    MinHash-LSH + Jaccard re-rank path: >= 0.9 of them must link back
    to their true term, and garbage surfaces must stay unlinked."""
    fx = _adversarial_linking_fixture(spark)
    garbage = [("qqq www zzz",), ("xxxyyy zzz",)]
    surfaces = spark.createDataFrame(
        [(s,) for s, _t in fx["typo_gold"]] + garbage, ["surface_norm"]
    )
    best = {
        r["surface_norm"]: r["term_id"]
        for r in fuzzy_link_best(surfaces, fx["alias"], min_jaccard=0.3).collect()
    }
    hits = sum(1 for s, t in fx["typo_gold"] if best.get(s) == t)
    assert hits / len(fx["typo_gold"]) >= 0.9, hits
    assert all(g[0] not in best for g in garbage)
