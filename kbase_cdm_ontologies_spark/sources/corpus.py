"""Deterministic synthetic corpus + golden oracle (FIXTURES.md).

The reference's correctness discipline is committed golden outputs
(outputs_test/: statements 162,810 rows, entailed_edge 430,947 rows —
reference README.md:142-144). This module is the engine's analog: a
seeded generator that emits

  * ``pages(url, warc_ts, html, text, lang)``  — input_hint schema
  * ``statements(stanza, subject, predicate, object, value, datatype,
    language, graph)`` — shape of semsql statements
    (outputs_test/parquet_files/statements.parquet)
  * plain-Python **oracle** computations: expected mentions, raw
    triples, linked triples, canonical map, closed edge set — computed
    with hand-rolled BFS/union-find, fully independent of Spark, so the
    pipeline's P/R >= 0.95 gate measures against a second implementation.

Everything is driven by one RNG seed; no wall clock, no network.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from ..functions.text_rules import (
    PREDICATE_CURIE,
    extract_svo,
    extract_text,
    normalize_surface,
)

ONTOLOGIES = ("AAA", "BBB", "CCC")
N_TERMS_PER_ONTO = 24

_ADJ = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "kappa", "lambda", "sigma", "theta", "proximal", "distal",
]
_NOUN = [
    "kinase", "membrane", "receptor", "pathway", "enzyme", "ligand",
    "channel", "domain", "complex", "vesicle", "organelle", "filament",
]
_NOISE = [
    "study", "result", "sample", "figure", "method", "analysis",
    "we", "observed", "measured", "robust", "signal", "control",
]

AMBIGUOUS_ALIAS = "omega factor"  # exact synonym of two terms (linking fixture)
SVO_VERBS = list(PREDICATE_CURIE)


def term_id(onto: str, i: int) -> str:
    return f"{onto}:{i:07d}"


@dataclass
class CorpusSpec:
    seed: int = 42
    n_pages: int = 500
    n_terms: int = N_TERMS_PER_ONTO
    # sentences per page: (2, 6) mimics the tiny test fixture; bench
    # uses (30, 60) to approximate real Common-Crawl page weight
    min_sents: int = 2
    max_sents: int = 6
    # plain-Python oracle computation is O(pages * aliases); benches
    # that only need the input tables skip it
    build_oracle: bool = True


@dataclass
class Corpus:
    spec: CorpusSpec
    statements: list[dict] = field(default_factory=list)
    alias_rows: list[dict] = field(default_factory=list)  # term_id, alias, alias_norm, kind, source_onto
    pages: list[dict] = field(default_factory=list)  # url, warc_ts, html, text, lang
    # oracle artifacts
    subclass_edges: list[tuple[str, str]] = field(default_factory=list)
    equiv_pairs: list[tuple[str, str]] = field(default_factory=list)
    restrictions: list[tuple[str, str, str]] = field(default_factory=list)  # (a, prop, c)
    individuals: list[tuple[str, str]] = field(default_factory=list)  # (ind, class)
    expected_canon: dict[str, str] = field(default_factory=dict)
    expected_mentions: set[tuple[str, str]] = field(default_factory=set)  # (url, term_id) unambiguous only
    expected_linked: set[tuple[str, str, str, str]] = field(default_factory=set)  # (url, s, p, o)
    expected_edges: set[tuple[str, str, str]] = field(default_factory=set)


# ---------------------------------------------------------------------------
# ontology fixture
# ---------------------------------------------------------------------------

def _build_ontology(c: Corpus, rng: random.Random) -> dict[str, list[str]]:
    """Statements + alias dict; returns term_id -> [aliases] map."""
    combos = [f"{a} {n}" for a in _ADJ for n in _NOUN]
    rng.shuffle(combos)
    # overflow pool for large n_terms (appended AFTER the shuffle so
    # small-fixture content is independent of pool size)
    combos3 = [
        f"{a} {b} {n}" for a in _ADJ for b in _ADJ if a != b for n in _NOUN
    ]
    rng.shuffle(combos3)
    pool = iter(combos + combos3)

    aliases: dict[str, list[str]] = {}
    nterm = c.spec.n_terms
    syn_kinds = ["exact", "related", "broad"]
    oio = {
        "exact": "oio:hasExactSynonym",
        "related": "oio:hasRelatedSynonym",
        "broad": "oio:hasBroadSynonym",
    }

    for onto in ONTOLOGIES:
        for i in range(nterm):
            t = term_id(onto, i)
            label = next(pool)
            al = [("label", label)]
            # every 2nd term gets one synonym; kind rotates
            if i % 2 == 0:
                al.append((syn_kinds[i % 3], next(pool)))
            aliases[t] = [a for _, a in al]
            c.statements.append(_stmt(t, t, "rdf:type", obj="owl:Class"))
            c.statements.append(_stmt(t, t, "rdfs:isDefinedBy", obj=f"obo:{onto.lower()}.owl"))
            for kind, a in al:
                pred = "rdfs:label" if kind == "label" else oio[kind]
                c.statements.append(_stmt(t, t, pred, value=a, language="en"))
                c.alias_rows.append(
                    dict(term_id=t, alias=a, alias_norm=normalize_surface(a),
                         kind=kind, source_onto=onto)
                )

    # ambiguous alias shared by AAA:10 and BBB:10 (entity-linking fixture)
    for onto in ("AAA", "BBB"):
        t = term_id(onto, 10)
        c.statements.append(_stmt(t, t, "oio:hasExactSynonym", value=AMBIGUOUS_ALIAS, language="en"))
        c.alias_rows.append(
            dict(term_id=t, alias=AMBIGUOUS_ALIAS,
                 alias_norm=normalize_surface(AMBIGUOUS_ALIAS),
                 kind="exact", source_onto=onto)
        )
        aliases[t].append(AMBIGUOUS_ALIAS)

    # subclass DAG: binary-tree within each onto (term i subClassOf i//2)
    for onto in ONTOLOGIES:
        for i in range(1, nterm):
            s, o = term_id(onto, i), term_id(onto, i // 2)
            c.subclass_edges.append((s, o))
            c.statements.append(_stmt(s, s, "rdfs:subClassOf", obj=o))
    # cross-ontology subclass links (merged-graph fixture)
    for s, o in [(term_id("BBB", 1), term_id("AAA", 3)), (term_id("CCC", 2), term_id("BBB", 4))]:
        c.subclass_edges.append((s, o))
        c.statements.append(_stmt(s, s, "rdfs:subClassOf", obj=o))

    # equivalences across ontologies incl. a chain (canonicalization fixture)
    c.equiv_pairs = [
        (term_id("AAA", 5), term_id("BBB", 5)),
        (term_id("BBB", 7), term_id("CCC", 7)),
        (term_id("AAA", 11), term_id("BBB", 11)),
        (term_id("BBB", 11), term_id("CCC", 11)),  # chain x≡y, y≡z
    ]
    for a, b in c.equiv_pairs:
        c.statements.append(_stmt(a, a, "owl:equivalentClass", obj=b))

    # property schema (relation-graph's property-level entailment
    # inputs; the golden entailed_edge is dominated by exactly these —
    # BFO:0000050 transitive, chains like regulates o part_of):
    #   part_of  = BFO:0000050  : transitive, subPropertyOf overlaps
    #   overlaps = RO:0002131
    #   regulates= RO:0002211   : regulates o part_of ⊑ regulates
    # stanza "AAA" attributes the shared property declarations to the
    # first core ontology, as OBO files re-declare imported properties —
    # they must travel through the render -> parse -> merge path
    for p in ("BFO:0000050", "RO:0002131", "RO:0002211"):
        c.statements.append(_stmt("AAA", p, "rdf:type", obj="owl:ObjectProperty"))
    c.statements.append(
        _stmt("AAA", "BFO:0000050", "rdf:type", obj="owl:TransitiveProperty")
    )
    c.statements.append(
        _stmt("AAA", "BFO:0000050", "rdfs:subPropertyOf", obj="RO:0002131")
    )
    c.statements.append(
        _stmt("AAA", "RO:0002211", "owl:propertyChainAxiom", obj="_:chainr0")
    )
    c.statements.append(_stmt("AAA", "_:chainr0", "rdf:first", obj="RO:0002211"))
    c.statements.append(_stmt("AAA", "_:chainr0", "rdf:rest", obj="_:chainr1"))
    c.statements.append(_stmt("AAA", "_:chainr1", "rdf:first", obj="BFO:0000050"))
    c.statements.append(_stmt("AAA", "_:chainr1", "rdf:rest", obj="rdf:nil"))

    # someValuesFrom restrictions via blank nodes, as RDF reifies them
    # (reference: 6,093 owl:someValuesFrom + 6,127 owl:onProperty rows).
    # AAA:8 -part_of-> AAA:2 -part_of-> AAA:5 exercises Trans(part_of);
    # BBB:9 -regulates-> BBB:3 -part_of-> BBB:1 exercises the chain.
    rest_specs = [
        (term_id("AAA", 8), "BFO:0000050", term_id("AAA", 2)),
        (term_id("AAA", 2), "BFO:0000050", term_id("AAA", 5)),
        (term_id("BBB", 9), "RO:0002211", term_id("BBB", 3)),
        (term_id("BBB", 3), "BFO:0000050", term_id("BBB", 1)),
        (term_id("CCC", 12), "BFO:0000050", term_id("CCC", 1)),
    ]
    for k, (a, p, cc) in enumerate(rest_specs):
        bn = f"_:riog{k:08d}"
        c.statements.append(_stmt(a, a, "rdfs:subClassOf", obj=bn))
        c.statements.append(_stmt(a, bn, "owl:onProperty", obj=p))
        c.statements.append(_stmt(a, bn, "owl:someValuesFrom", obj=cc))
        c.restrictions.append((a, p, cc))

    # individuals with rdf:type assertions (relation-graph runs with
    # --output-individuals true, workflow.ipynb:1638): each entails
    # type edges up the class hierarchy
    ind_specs = [
        (f"{onto}:IND{k:04d}", term_id(onto, 6 + k))
        for onto in ONTOLOGIES
        for k in range(2)
    ]
    for ind, cls in ind_specs:
        c.statements.append(_stmt(ind, ind, "rdf:type", obj="owl:NamedIndividual"))
        c.statements.append(_stmt(ind, ind, "rdf:type", obj=cls))
        c.individuals.append((ind, cls))

    # owl:Nothing noise — must be excluded everywhere
    # (reference: robot remove --term owl:Nothing, merge_ontologies.py:108-111)
    c.statements.append(_stmt("owl:Nothing", "owl:Nothing", "rdfs:subClassOf", obj=term_id("AAA", 0)))
    return aliases


def _stmt(stanza, subject, predicate, obj=None, value=None, datatype=None, language=None):
    return dict(stanza=stanza, subject=subject, predicate=predicate,
                object=obj, value=value,
                datatype=datatype if datatype else ("xsd:string" if value is not None and language is None else None),
                language=language, graph=None)


# ---------------------------------------------------------------------------
# oracle: canonicalization + closure (hand-rolled, Spark-free)
# ---------------------------------------------------------------------------

def _union_find_canon(terms: set[str], pairs: list[tuple[str, str]]) -> dict[str, str]:
    parent = {t: t for t in terms}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = lexicographic min of component
    comp: dict[str, list[str]] = {}
    for t in terms:
        comp.setdefault(find(t), []).append(t)
    out = {}
    for members in comp.values():
        c = min(members)
        for m in members:
            out[m] = c
    return out


def _closure_oracle(c: Corpus) -> set[tuple[str, str, str]]:
    """Reference semantics (SURVEY.md §2.8 / relation-graph flags):
    reflexive-transitive subclass closure over canonical ids,
    equivalence-as-subclass collapsed by canonicalization,
    someValuesFrom property entailment sub(a) x super(c),
    owl:Nothing suppressed."""
    canon = c.expected_canon
    nodes = {canon[t] for t in canon if t != "owl:Nothing"}
    sub_edges = {
        (canon[s], canon[o])
        for s, o in c.subclass_edges
        if s != "owl:Nothing" and o != "owl:Nothing"
    }
    # adjacency up
    up: dict[str, set[str]] = {}
    for s, o in sub_edges:
        up.setdefault(s, set()).add(o)
    # reflexive-transitive superclass sets via BFS
    supers: dict[str, set[str]] = {}
    for n in nodes:
        seen = {n}
        stack = [n]
        while stack:
            x = stack.pop()
            for y in up.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        supers[n] = seen
    subs: dict[str, set[str]] = {n: set() for n in nodes}
    for n in nodes:
        for a in supers[n]:
            subs[a].add(n)

    edges: set[tuple[str, str, str]] = set()
    for n in nodes:
        for a in supers[n]:
            edges.add((n, "rdfs:subClassOf", a))  # includes reflexive n==a
    # base existential edges, then full property-rule saturation
    # (SubRole / Trans / Chain — must equal closure.property_closure)
    prop_edges: set[tuple[str, str, str]] = set()
    for a, p, cc in c.restrictions:
        ca, ccc = canon[a], canon[cc]
        for x in subs.get(ca, {ca}):
            for d in supers.get(ccc, {ccc}):
                prop_edges.add((x, p, d))
    hierarchy = {"BFO:0000050": {"BFO:0000050", "RO:0002131"}}
    transitive = {"BFO:0000050"}
    chains = [("RO:0002211", "BFO:0000050", "RO:0002211")]
    while True:
        new = set(prop_edges)
        for s, p, o in prop_edges:
            for q in hierarchy.get(p, ()):
                new.add((s, q, o))
        for t in transitive:
            adj: dict[str, set[str]] = {}
            for s, p, o in new:
                if p == t:
                    adj.setdefault(s, set()).add(o)
            for s in adj:
                seen: set[str] = set()
                stack = list(adj[s])
                while stack:
                    x = stack.pop()
                    if x in seen:
                        continue
                    seen.add(x)
                    stack.extend(adj.get(x, ()))
                new |= {(s, t, o) for o in seen if o != s}
        for p1, p2, r in chains:
            lefts = [(s, o) for s, p, o in new if p == p1]
            rights: dict[str, set[str]] = {}
            for s, p, o in new:
                if p == p2:
                    rights.setdefault(s, set()).add(o)
            for s, y in lefts:
                for z in rights.get(y, ()):
                    if s != z:
                        new.add((s, r, z))
        if new == prop_edges:
            break
        prop_edges = new
    edges |= prop_edges
    # individuals: (ind, rdf:type, D) for every D above the asserted
    # class (--output-individuals true semantics)
    for ind, cls in c.individuals:
        ccls = canon.get(cls, cls)
        for d in supers.get(ccls, {ccls}):
            edges.add((ind, "rdf:type", d))
    return edges


# ---------------------------------------------------------------------------
# pages + mention/linking oracle
# ---------------------------------------------------------------------------

def page_context(c: Corpus, aliases: dict[str, list[str]]) -> dict:
    """The small, picklable context a page renderer needs — built once,
    broadcastable for distributed generation (sources/synth.py)."""
    alias_index: dict[str, list[str]] = {}
    for r in c.alias_rows:
        alias_index.setdefault(r["alias_norm"], []).append(r["term_id"])
    unambiguous = {a: ts[0] for a, ts in alias_index.items() if len(ts) == 1}
    term_onto = {t: t.split(":")[0] for t in aliases}
    return dict(
        unambiguous=unambiguous,
        term_onto=term_onto,
        hot_alias=c.alias_rows[0]["alias"],  # skew fixture: ~60% of pages
        all_aliases=sorted(
            {r["alias"] for r in c.alias_rows if r["alias"] != AMBIGUOUS_ALIAS}
        ),
        ctx_alias={o: aliases[term_id(o, 2)][0] for o in ONTOLOGIES},
        min_sents=c.spec.min_sents,
        max_sents=c.spec.max_sents,
        seed=c.spec.seed,
    )


_PAGE_LANGS = ["en"] * 9 + ["de", "es"]
_PAGE_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def render_page(i: int, ctx: dict) -> dict:
    """Render page i deterministically (per-page RNG: independent of
    generation order/partitioning, so driver-side and distributed
    generation emit byte-identical rows)."""
    rng = random.Random(f"{ctx['seed']}:{i}")
    url = f"https://example.org/p{i:06d}"
    lang = _PAGE_LANGS[i % len(_PAGE_LANGS)]
    all_aliases = ctx["all_aliases"]
    sents: list[str] = []
    n_sent = rng.randint(ctx["min_sents"], ctx["max_sents"])
    used_onto_context: str | None = None
    for _ in range(n_sent):
        kind = rng.random()
        if kind < 0.35:  # mention sentence
            a = rng.choice(all_aliases)
            sents.append(
                f"The {a} {rng.choice(_NOISE)} was {rng.choice(_NOISE)} in this {rng.choice(_NOISE)}."
            )
            if a in ctx["unambiguous"]:
                used_onto_context = ctx["term_onto"][ctx["unambiguous"][a]]
        elif kind < 0.6:  # SVO sentence
            s_alias = rng.choice(all_aliases)
            o_alias = rng.choice(all_aliases)
            verb = rng.choice(SVO_VERBS)
            sents.append(f"{s_alias.capitalize()} {verb} {o_alias}.")
        else:  # noise
            sents.append(
                " ".join(rng.choice(_NOISE) for _ in range(rng.randint(5, 10))).capitalize() + "."
            )
    if rng.random() < 0.6:
        sents.append(f"The {ctx['hot_alias']} appears again here.")
    if rng.random() < 0.1:
        # ambiguous mention; context decides AAA vs BBB
        ctx_onto = used_onto_context or rng.choice(["AAA", "BBB"])
        if ctx_onto not in ctx["ctx_alias"]:
            ctx_onto = "AAA"
        sents.append(
            f"The {ctx['ctx_alias'][ctx_onto]} level tracked the {AMBIGUOUS_ALIAS} closely."
        )

    title = f"Report {i:06d} on {rng.choice(_NOISE)}"
    body = " ".join(sents)
    html = (
        "<html><head><title>" + title + "</title>"
        "<style>body { color: #000; }</style></head>\n"
        "<body><h1>" + title + "</h1>\n"
        "<script>var x = 1 &amp;&amp; 2;</script>\n"
        "<p>" + body + "</p>\n"
        "<div>footer &copy; example</div></body></html>"
    ).encode("utf-8")
    text = extract_text(html)
    return dict(
        url=url, warc_ts=_PAGE_T0 + timedelta(seconds=i), html=html, text=text, lang=lang
    )


def _build_pages(c: Corpus, rng: random.Random, aliases: dict[str, list[str]]) -> None:
    ctx = page_context(c, aliases)
    for i in range(c.spec.n_pages):
        c.pages.append(render_page(i, ctx))


def _link_oracle(c: Corpus) -> None:
    """Mention + SVO-link oracle with the engine's disambiguation rule:
    candidate score = count of unambiguous mentions on the page from the
    candidate's source ontology; argmax, ties -> min term_id."""
    alias_index: dict[str, list[str]] = {}
    for r in c.alias_rows:
        alias_index.setdefault(r["alias_norm"], []).append(r["term_id"])
    for k in alias_index:
        alias_index[k] = sorted(set(alias_index[k]))
    patterns = sorted(alias_index)

    import re as _re
    pat_res = {p: _re.compile(r"(?<![a-z0-9])" + _re.escape(p) + r"(?![a-z0-9])") for p in patterns}

    for page in c.pages:
        if page["lang"] != "en":
            continue
        tnorm = normalize_surface(page["text"])
        url = page["url"]
        found = [p for p in patterns if pat_res[p].search(tnorm)]
        onto_counts: dict[str, int] = {}
        for p in found:
            cands = alias_index[p]
            if len(cands) == 1:
                onto_counts[cands[0].split(":")[0]] = onto_counts.get(cands[0].split(":")[0], 0) + 1

        def resolve(surface_norm: str) -> str | None:
            cands = alias_index.get(surface_norm)
            if not cands:
                return None
            if len(cands) == 1:
                return cands[0]
            best = max(cands, key=lambda t: (onto_counts.get(t.split(":")[0], 0), ), default=None)
            # ties -> min term_id: max() keeps first on tie, so sort first
            scored = sorted(cands, key=lambda t: (-onto_counts.get(t.split(":")[0], 0), t))
            return scored[0]

        for p in found:
            for t in alias_index[p]:
                if len(alias_index[p]) == 1:
                    c.expected_mentions.add((url, t))
        for s_surf, pred, o_surf in extract_svo(page["text"]):
            s_id, o_id = resolve(s_surf), resolve(o_surf)
            if s_id and o_id:
                canon = c.expected_canon
                c.expected_linked.add((url, canon[s_id], pred, canon[o_id]))


# ---------------------------------------------------------------------------

def generate_corpus(spec: CorpusSpec | None = None) -> Corpus:
    spec = spec or CorpusSpec()
    c = Corpus(spec=spec)
    rng = random.Random(spec.seed)
    aliases = _build_ontology(c, rng)
    all_terms = set(aliases) | {"owl:Nothing"}
    c.expected_canon = _union_find_canon(all_terms, c.equiv_pairs)
    _build_pages(c, rng, aliases)
    if spec.build_oracle:
        _link_oracle(c)
        c.expected_edges = _closure_oracle(c)
        # final oracle edge set = ontology closure ∪ linked SVO triples
        for _, s, p, o in c.expected_linked:
            c.expected_edges.add((s, p, o))
    return c


def corpus_to_spark(spark, c: Corpus):
    """Materialize corpus tables as DataFrames (pages, statements, alias)."""
    from pyspark.sql import types as T

    pages_schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ])
    stmt_schema = T.StructType([
        T.StructField(f, T.StringType(), True)
        for f in ["stanza", "subject", "predicate", "object", "value", "datatype", "language", "graph"]
    ])
    alias_schema = T.StructType([
        T.StructField(f, T.StringType(), False)
        for f in ["term_id", "alias", "alias_norm", "kind", "source_onto"]
    ])
    pages = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in c.pages],
        schema=pages_schema,
    )
    stmts = spark.createDataFrame(
        [tuple(s[k] for k in ["stanza", "subject", "predicate", "object", "value", "datatype", "language", "graph"])
         for s in c.statements],
        schema=stmt_schema,
    )
    alias = spark.createDataFrame(
        [tuple(r[k] for k in ["term_id", "alias", "alias_norm", "kind", "source_onto"])
         for r in c.alias_rows],
        schema=alias_schema,
    )
    return pages, stmts, alias
