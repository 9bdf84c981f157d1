#!/usr/bin/env python
"""Single-process EL-saturation oracle vs the reference's golden output.

Runs the EXACT rule set the engine's closure operators implement
(conjunction/union expression normalization, subclass closure,
existential base links with subject-descent/object-ascent, SubRole
lift, per-property transitivity, subrole-expanded chains) as plain
Python sets over the reference's own merged statements table, and
scores the result against the reference's golden entailed_edge.

Measured on /root/reference/outputs_test (162,810 statements ->
430,947 golden edges): precision 0.999814, recall 0.999944 over the
golden predicate inventory (the semsql exclude-terms input file is not
shipped with the reference, so predicates it removed from
relation-graph's input cannot be reconstructed; recall is unaffected).
Rule set includes the rdfs:domain rule (a restriction node ∃p.C is a
subclass of domain(p)) and the union link rule (LINK_UNION below);
the remaining ~22 missing golden edges trace through equivalence-
reified paths the reference's own robot-remove step severed.

This is the semantic parity gate for the engine's distributed
implementation (operators/closure.py), whose rules are asserted equal
to this saturation on randomized schemas in tests/test_closure.py.
Runtime: ~3 minutes, no Spark required.
"""
import builtins
builtins.LINK_UNION = True

"""Experiment: reproduce relation-graph's entailed_edge from the
reference's own statements.parquet with a pure-Python EL saturation,
comparing per-predicate counts against the golden output."""
import duckdb, collections, itertools, sys

con = duckdb.connect()
ST = "/root/reference/outputs_test/parquet_files/statements.parquet"
EE = "/root/reference/outputs_test/parquet_files/entailed_edge.parquet"
rows = con.sql(f"SELECT stanza, subject, predicate, object FROM '{ST}' WHERE object IS NOT NULL").fetchall()
gold = set(map(tuple, con.sql(f"SELECT subject, predicate, object FROM '{EE}'").fetchall()))

by_pred = collections.defaultdict(list)
for stanza, s, p, o in rows:
    by_pred[p].append((s, o))

def named(x): return not x.startswith("_:")

# class declarations
classes = {s for s, o in by_pred["rdf:type"] if o == "owl:Class" and named(s)}

# bnode maps
on_prop = dict(by_pred["owl:onProperty"])
some_from = dict(by_pred["owl:someValuesFrom"])
inter_of = dict(by_pred["owl:intersectionOf"])
union_of = dict(by_pred["owl:unionOf"])
firsts = dict(by_pred["rdf:first"])
rests = dict(by_pred["rdf:rest"])

domains = {}
for s, o in by_pred["rdfs:domain"]:
    domains.setdefault(s, set()).add(o)


def rdf_list(bn):
    out = []
    while bn and bn != "rdf:nil":
        if bn in firsts: out.append(firsts[bn])
        bn = rests.get(bn)
    return out

# named subclass edges + restriction axioms (a,p,c) incl. via intersection decomposition
sub_edges = set()
restr = set()
processed = set()
def process_expr(e, depth=0):
    """Register an expression node in the saturation (ELK-style fresh
    atomic class per anonymous expression): intersection members become
    superclasses of the bnode, union members become subclasses, nested
    restrictions become the bnode's own existential links — so chains
    compose THROUGH anonymous fillers. Output later strips bnodes."""
    if named(e) or e in processed or depth > 6: return e
    processed.add(e)
    if e in inter_of:
        for m in rdf_list(inter_of[e]):
            sub_edges.add((e, process_expr(m, depth+1)))
    if e in union_of:
        for m in rdf_list(union_of[e]):
            sub_edges.add((process_expr(m, depth+1), e))
    if e in on_prop and e in some_from:
        restr.add((e, on_prop[e], process_expr(some_from[e], depth+1)))
        # rdfs:domain rule (Whelk): the restriction node ∃p.C is a
        # subclass of domain(p) — nested fillers then ascend to it
        for D in domains.get(on_prop[e], ()):
            sub_edges.add((e, D))
    return e

for s, o in by_pred["rdfs:subClassOf"]:
    sub_edges.add((process_expr(s), process_expr(o)))

# property schema
trans = {s for s, o in by_pred["rdf:type"] if o == "owl:TransitiveProperty"}
symmetric = {s for s, o in by_pred["rdf:type"] if o == "owl:SymmetricProperty"}
inverses = collections.defaultdict(set)
for a, b in by_pred["owl:inverseOf"]:
    if named(a) and named(b):
        inverses[a].add(b); inverses[b].add(a)
subprop = collections.defaultdict(set)
for s, o in by_pred["rdfs:subPropertyOf"]:
    if named(s) and named(o): subprop[s].add(o)
def up_props(p):
    seen = {p}; stack=[p]
    while stack:
        c = stack.pop()
        for q in subprop.get(c, ()):
            if q not in seen: seen.add(q); stack.append(q)
    return seen
chains = []
for r, bn in by_pred["owl:propertyChainAxiom"]:
    m = rdf_list(bn)
    if len(m) == 2: chains.append((m[0], m[1], r))
    elif len(m) > 2:
        acc = m[0]
        for i, x in enumerate(m[1:], 1):
            tgt = r if i == len(m)-1 else f"_:step_{r}_{i}"
            chains.append((acc, x, tgt)); acc = tgt

# class hierarchy closure, interleaved with union-right elimination:
# (A union B) sub X  iff  A sub X and B sub X — the union node inherits
# the COMMON supers of its members (Whelk derives these; needed for
# x sub Exists p.(A union B) to reach named targets)
union_members = {bn: [m for m in rdf_list(lst)] for bn, lst in union_of.items()}
up = collections.defaultdict(set)
for s, o in sub_edges: up[s].add(o)
nodes = classes | {s for s,_ in sub_edges} | {o for _,o in sub_edges}
nodes |= set(union_members) | {m for ms in union_members.values() for m in ms}
while True:
    supers = {}
    for n in nodes:
        seen = {n}; stack=[n]
        while stack:
            x = stack.pop()
            for y in up.get(x, ()):
                if y not in seen: seen.add(y); stack.append(y)
        supers[n] = seen
    grew = False
    for bn, ms in union_members.items():
        if not ms: continue
        common = set.intersection(*[supers.get(m, {m}) for m in ms]) - {bn}
        for c in common:
            if c not in up[bn]:
                up[bn].add(c); grew = True
    if not grew: break
subs = collections.defaultdict(set)
for n in nodes:
    for a in supers[n]: subs[a].add(n)

def saturate(subject_descent=True, object_ascent=True, premise_subrole=True,
             emit_lift=False):
    # base links
    links = set()
    for a, p, c in restr:
        xs = subs.get(a, {a}) if subject_descent else {a}
        ds = supers.get(c, {c}) if object_ascent else {c}
        for x in xs:
            for d in ds:
                links.add((x, p, d))
    # premise expansion table: chain (p1,p2,r) matches edges with prop in down(p1) etc.
    downp = collections.defaultdict(set)
    allprops = {p for _,p,_ in restr} | trans | {q for c3 in chains for q in c3}
    for p in set(itertools.chain.from_iterable(up_props(q) for q in allprops)) | allprops:
        for q in up_props(p):
            downp[q].add(p)
    rules = []  # (set_of_p1, set_of_p2, r)
    for t in trans:
        ps = downp[t] if premise_subrole else {t}
        rules.append((ps, ps, t))
    for p1, p2, r in chains:
        rules.append((downp[p1] if premise_subrole else {p1},
                      downp[p2] if premise_subrole else {p2}, r))
    if emit_lift:
        for s, p, o in list(links):
            for q in up_props(p) - {p}:
                links.add((s, q, o))
    while True:
        new = set()
        by_src = collections.defaultdict(list)
        for s, p, o in links: by_src[s].append((p, o))
        if LINK_UNION:
            for bn, ms in union_members.items():
                if not ms: continue
                common = None
                for m in ms:
                    lm = set(by_src.get(m, ()))
                    common = lm if common is None else (common & lm)
                    if not common: break
                for p, o in (common or ()):
                    if (bn, p, o) not in links: new.add((bn, p, o))
        for ps1, ps2, r in rules:
            for s, p, o in links:
                if p in ps1:
                    for p2, o2 in by_src.get(o, ()):
                        if p2 in ps2 and (s, r, o2) not in links:
                            new.add((s, r, o2))
        if not new: break
        links |= new
        if emit_lift:
            more = set()
            for s, p, o in links:
                for q in up_props(p) - {p}:
                    if (s, q, o) not in links: more.add((s, q, o))
            links |= more
    # strip synthetic + owl:Thing (relation-graph emits no Thing edges)
    links = {(s,p,o) for s,p,o in links
             if not p.startswith("_:step_") and o != "owl:Thing" and s != "owl:Thing"
             and named(s) and named(o)}
    # subclass output: reflexive-transitive over named classes
    out = set(links)
    for n in nodes:
        if n == "owl:Thing" or not named(n): continue
        for a in supers[n]:
            if a != "owl:Thing" and named(a):
                out.add((n, "rdfs:subClassOf", a))
    return out


got = saturate(emit_lift=True)
gold_preds = {p for _, p, _ in gold}
got_f = {t for t in got if t[1] in gold_preds}
tp = len(got_f & gold)
import json
print(json.dumps({
    "engine_rule_edges": len(got_f), "golden_edges": len(gold),
    "true_positives": tp,
    "precision": round(tp / len(got_f), 6), "recall": round(tp / len(gold), 6),
}))
