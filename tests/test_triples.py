"""M4: JVM-regex SVO extraction == pure-Python extract_svo oracle."""

from kbase_cdm_ontologies_spark.functions.text_rules import extract_svo
from kbase_cdm_ontologies_spark.operators.text_extract import extract_text_stage
from kbase_cdm_ontologies_spark.operators.triples import extract_triples


def test_raw_triples_match_oracle(corpus, corpus_dfs):
    extracted = extract_text_stage(corpus_dfs["pages"])
    got = {
        (r["url"], r["subj_surface"], r["pred"], r["obj_surface"])
        for r in extract_triples(extracted).collect()
    }
    want = set()
    for p in corpus.pages:
        if p["lang"] != "en":
            continue
        for s, pred, o in extract_svo(p["text"]):
            want.add((p["url"], s, pred, o))
    assert got == want
    assert len(want) > 50  # fixture actually exercises the extractor
