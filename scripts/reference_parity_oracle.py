#!/usr/bin/env python
"""Single-process EL-saturation oracle vs the reference's golden output.

Runs the EXACT rule set the engine's closure operators implement —
robot-min input reduction (equivalents, abox typing, semsql
exclude-terms with preserve-structure rewiring), whole-axiom drop of
non-EL constructs, structural interning of anonymous expressions,
conjunction/union expression normalization, union-right elimination
over the interned lattice, the rdfs:domain rule through the property
hierarchy, existential base links with subject-descent/object-ascent,
SubRole lift, per-property transitivity, subrole-expanded chains — as
plain Python sets over the reference's own merged statements table,
and scores the result against the reference's golden entailed_edge.

Measured on /root/reference/outputs_test (162,810 statements ->
430,947 golden edges): precision 1.0 / recall 1.0, UNCONDITIONAL
(full predicate inventory, no restriction) — the same exact-parity
result as the Spark engine (scripts/reference_parity.py), reproduced
here with no Spark involved, so the two implementations witness each
other. Runtime: ~2 minutes.
"""
import collections
import hashlib
import itertools
import json

import duckdb

con = duckdb.connect()
ST = "/root/reference/outputs_test/parquet_files/statements.parquet"
EE = "/root/reference/outputs_test/parquet_files/entailed_edge.parquet"
rows = con.sql(
    f"SELECT stanza, subject, predicate, object FROM '{ST}' WHERE object IS NOT NULL"
).fetchall()
gold = set(map(tuple, con.sql(f"SELECT subject, predicate, object FROM '{EE}'").fetchall()))

# --- robot-min emulation (operators/robot_min.py) ----------------------
EXCLUDE = {
    "RO:0002323", "RO:0002324", "RO:0002410", "RO:0002506", "RO:0002222",
    "RO:0002320", "RO:0002501", "RO:0002595", "RO:0002567", "RO:0002375",
    "RO:0002514", "RO:0002321",
}
# preserve-structure bridges: children of an excluded term re-attach to
# its nearest non-excluded ancestors (through excluded-only paths)
hier_rows = [
    (s, p, o) for _st, s, p, o in rows
    if p in ("rdfs:subPropertyOf", "rdfs:subClassOf") and (s in EXCLUDE or o in EXCLUDE)
]
_parents: dict = collections.defaultdict(set)
_children: dict = collections.defaultdict(set)
for s, p, o in hier_rows:
    if s in EXCLUDE:
        _parents[(p, s)].add(o)
    if o in EXCLUDE:
        _children[(p, o)].add(s)
bridges = []
for pred in ("rdfs:subPropertyOf", "rdfs:subClassOf"):
    for x in EXCLUDE:
        kids = {c for c in _children.get((pred, x), ()) if c not in EXCLUDE}
        if not kids:
            continue
        tops, stack, seen = set(), [x], {x}
        while stack:
            cur = stack.pop()
            for par in _parents.get((pred, cur), ()):
                if par in EXCLUDE:
                    if par not in seen:
                        seen.add(par)
                        stack.append(par)
                else:
                    tops.add(par)
        bridges += [("bridge", c, pred, t) for c in kids for t in tops]
rows = [
    r for r in rows
    if r[2] != "owl:equivalentClass" and r[1] not in EXCLUDE and r[3] not in EXCLUDE
] + bridges

by_pred = collections.defaultdict(list)
for _stanza, s, p, o in rows:
    by_pred[p].append((s, o))

def named(x):
    return not x.startswith("_:")

# --- non-EL whole-axiom drop (closure.drop_non_el_axioms) --------------
NON_EL = (
    "owl:allValuesFrom", "owl:hasValue", "owl:maxCardinality",
    "owl:minCardinality", "owl:cardinality", "owl:maxQualifiedCardinality",
    "owl:minQualifiedCardinality", "owl:qualifiedCardinality",
)
taint_parents: dict = collections.defaultdict(set)
tainted: set = set()
for _stanza, s, p, o in rows:
    if not s.startswith("_:"):
        continue
    if p in NON_EL:
        tainted.add(s)
    elif p in ("owl:onProperty", "owl:someValuesFrom", "owl:intersectionOf",
               "owl:unionOf", "rdf:first", "rdf:rest") and o.startswith("_:"):
        taint_parents[o].add(s)
stack = list(tainted)
while stack:
    cur = stack.pop()
    for par in taint_parents.get(cur, ()):
        if par not in tainted:
            tainted.add(par)
            stack.append(par)
by_pred = {
    p: [(s, o) for s, o in so if s not in tainted and o not in tainted]
    for p, so in by_pred.items()
}
by_pred = collections.defaultdict(list, by_pred)

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
        if bn in firsts:
            out.append(firsts[bn])
        bn = rests.get(bn)
    return out

# --- structural interning (closure.canonicalize_expressions) -----------
canon: dict = {}

def cof(x):
    return canon.get(x, x)

expr_bns = set(on_prop) | set(some_from) | set(inter_of) | set(union_of)
for _ in range(32):
    changed = False
    for bn in expr_bns:
        if bn in inter_of or bn in union_of:
            kind = "I" if bn in inter_of else "U"
            head = inter_of.get(bn, union_of.get(bn))
            sig = kind + "|" + "|".join(sorted({cof(m) for m in rdf_list(head)}))
        else:
            sig = ("R|" + on_prop.get(bn, "") + "~" + cof(some_from.get(bn, "")))
        new = "_:x" + hashlib.md5(sig.encode()).hexdigest()[:20]
        if canon.get(bn) != new:
            canon[bn] = new
            changed = True
    if not changed:
        break

# property schema (needed by the domain rule below)
trans = {s for s, o in by_pred["rdf:type"] if o == "owl:TransitiveProperty"}
subprop = collections.defaultdict(set)
for s, o in by_pred["rdfs:subPropertyOf"]:
    if named(s) and named(o):
        subprop[s].add(o)

def up_props(p):
    seen = {p}
    stack = [p]
    while stack:
        c = stack.pop()
        for q in subprop.get(c, ()):
            if q not in seen:
                seen.add(q)
                stack.append(q)
    return seen

# named subclass edges + restriction axioms (a,p,c), canonical ids
sub_edges = set()
restr = set()
processed = set()

def process_expr(e, depth=0):
    """Register an expression node (ELK-style fresh atomic class per
    CANONICAL anonymous expression): intersection members become
    superclasses of the node, union members subclasses, restrictions
    the node's own existential links; the domain of every
    super-property of onProperty becomes a superclass (Whelk's domain
    rule through the hierarchy)."""
    ce = cof(e)
    if named(e) or ce in processed or depth > 6:
        return ce
    processed.add(ce)
    if e in inter_of:
        for m in rdf_list(inter_of[e]):
            sub_edges.add((ce, process_expr(m, depth + 1)))
    if e in union_of:
        for m in rdf_list(union_of[e]):
            sub_edges.add((process_expr(m, depth + 1), ce))
    if e in on_prop and e in some_from:
        restr.add((ce, on_prop[e], process_expr(some_from[e], depth + 1)))
        for q in up_props(on_prop[e]):
            for D in domains.get(q, ()):
                sub_edges.add((ce, cof(D)))
    return ce

for s, o in by_pred["rdfs:subClassOf"]:
    sub_edges.add((process_expr(s), process_expr(o)))
# canonical duplicates of the same expression each carry their own
# reification rows — process every expression bnode, not just
# subclass-reachable ones, so unions/restrictions used only as fillers
# register too
for bn in list(expr_bns):
    process_expr(bn)

chains = []
for r, bn in by_pred["owl:propertyChainAxiom"]:
    m = rdf_list(bn)
    if len(m) == 2:
        chains.append((m[0], m[1], r))
    elif len(m) > 2:
        acc = m[0]
        for i, x in enumerate(m[1:], 1):
            tgt = r if i == len(m) - 1 else f"_:step_{r}_{i}"
            chains.append((acc, x, tgt))
            acc = tgt

# class hierarchy closure, interleaved with union-right elimination:
# (A union B) sub X  iff  A sub X and B sub X — over the INTERNED
# lattice, which is exactly Whelk's disjunction elimination (members
# asserting structurally identical restrictions reach the SAME node)
union_members = {
    cof(bn): [cof(m) for m in rdf_list(lst)] for bn, lst in union_of.items()
}
up = collections.defaultdict(set)
for s, o in sub_edges:
    up[s].add(o)
nodes = classes | {s for s, _ in sub_edges} | {o for _, o in sub_edges}
nodes |= set(union_members) | {m for ms in union_members.values() for m in ms}
while True:
    supers = {}
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
    grew = False
    for bn, ms in union_members.items():
        if not ms:
            continue
        common = set.intersection(*[supers.get(m, {m}) for m in ms]) - {bn}
        for c in common:
            if c not in up[bn]:
                up[bn].add(c)
                grew = True
    if not grew:
        break
subs = collections.defaultdict(set)
for n in nodes:
    for a in supers[n]:
        subs[a].add(n)


def saturate():
    # base links: x sub a, a = Exists p.c, c sub d  =>  (x, p, d)
    links = set()
    for a, p, c in restr:
        for x in subs.get(a, {a}):
            for d in supers.get(c, {c}):
                links.add((x, p, d))
    downp = collections.defaultdict(set)
    allprops = {p for _, p, _ in restr} | trans | {q for c3 in chains for q in c3}
    for p in set(itertools.chain.from_iterable(up_props(q) for q in allprops)) | allprops:
        for q in up_props(p):
            downp[q].add(p)
    rules = []
    for t in trans:
        rules.append((downp[t], downp[t], t))
    for p1, p2, r in chains:
        rules.append((downp[p1], downp[p2], r))
    for s, p, o in list(links):
        for q in up_props(p) - {p}:
            links.add((s, q, o))
    while True:
        new = set()
        by_src = collections.defaultdict(list)
        for s, p, o in links:
            by_src[s].append((p, o))
        for ps1, ps2, r in rules:
            for s, p, o in links:
                if p in ps1:
                    for p2, o2 in by_src.get(o, ()):
                        if p2 in ps2 and (s, r, o2) not in links:
                            new.add((s, r, o2))
        if not new:
            break
        links |= new
        more = set()
        for s, p, o in links:
            for q in up_props(p) - {p}:
                if (s, q, o) not in links:
                    more.add((s, q, o))
        links |= more
    links = {
        (s, p, o) for s, p, o in links
        if not p.startswith("_:step_") and o != "owl:Thing" and s != "owl:Thing"
        and named(s) and named(o)
    }
    out = set(links)
    for n in nodes:
        if n == "owl:Thing" or not named(n):
            continue
        for a in supers[n]:
            if a != "owl:Thing" and named(a):
                out.add((n, "rdfs:subClassOf", a))
    return out


got = saturate()
tp = len(got & gold)
print(json.dumps({
    "engine_rule_edges": len(got), "golden_edges": len(gold),
    "true_positives": tp,
    "precision": round(tp / len(got), 6), "recall": round(tp / len(gold), 6),
    "unconditional": True,
}))
