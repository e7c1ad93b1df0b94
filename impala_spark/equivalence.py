"""Slot-equivalence machinery: DisjointSet + column equivalence classes.

The reference computes equivalence classes of slots from equality
predicates with a union-find structure
(fe/src/main/java/org/apache/impala/util/DisjointSet.java, pinned by
fe/src/test/java/org/apache/impala/util/TestDisjointSet.java) and uses
them in the analyzer's value-transfer graph
(A/Analyzer.java:273-290,1644-1826) to propagate predicates and create
equi-join conjuncts. On Spark, Catalyst's InferFiltersFromConstraints /
PushPredicateThroughJoin already perform that propagation at plan time —
so the engine does NOT re-run value transfer per statement.

What the classes are still worth at 100 TB is LAYOUT advice: columns in
one equivalence class are join keys of each other, so hash-bucketing
their tables on the class (same bucket count) removes the join-key
exchange from every query in the workload (the r11 `PARTITION BY HASH`
capability, ddl.py:185). ``colocation_advice`` ranks a workload's
equivalence classes by how many statements they would de-shuffle.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Collection, Iterable


class DisjointSet:
    """Union-find over hashable items, same surface as the reference's
    DisjointSet<T>: members of a merged set share ONE set object, and
    union()/bulk_union() report whether they changed anything."""

    def __init__(self) -> None:
        #: item -> the set object it belongs to (shared identity)
        self._item_sets: dict[object, set] = {}
        #: the distinct set objects (id-keyed: sets aren't hashable)
        self._unique_sets: dict[int, set] = {}

    def get(self, item) -> set | None:
        return self._item_sets.get(item)

    def get_sets(self) -> list[set]:
        return list(self._unique_sets.values())

    def make_set(self, item) -> set:
        """Create a new single-item set; error if the item already has one
        (DisjointSet.makeSet)."""
        if item in self._item_sets:
            raise ValueError(f"item already has an item set: {item!r}")
        s = {item}
        self._item_sets[item] = s
        self._unique_sets[id(s)] = s
        return s

    def union(self, a, b) -> bool:
        """Merge the sets of a and b, creating singletons for unknown
        items. Returns True if the structure changed."""
        sa, sb = self._item_sets.get(a), self._item_sets.get(b)
        if sa is not None and sa is sb:
            return False
        changed = False
        if sa is None:
            sa = self.make_set(a)
            changed = True
        if sb is None:
            if a == b:  # union(x, x) on a fresh item made one set already
                return changed
            sb = self.make_set(b)
            changed = True
        if sa is sb:
            return changed
        # merge the smaller set into the larger one
        if len(sa) < len(sb):
            sa, sb = sb, sa
        for item in sb:
            sa.add(item)
            self._item_sets[item] = sa
        del self._unique_sets[id(sb)]
        return True

    def bulk_union(self, items: Collection) -> bool:
        """Union all items into one set (DisjointSet.bulkUnion)."""
        it = iter(items)
        try:
            first = next(it)
        except StopIteration:
            return False
        changed = False
        for item in it:
            if self.union(first, item):
                changed = True
        if first not in self._item_sets:
            self.make_set(first)
            changed = True
        return changed

    def check_consistency(self) -> None:
        """Validate the item->set and unique-set indexes against each
        other; raises on tampering (DisjointSet.checkConsistency)."""
        seen: set[int] = set()
        for s in self._unique_sets.values():
            for item in s:
                if self._item_sets.get(item) is not s:
                    raise RuntimeError("DisjointSet is in an inconsistent state")
            seen.add(id(s))
        for item, s in self._item_sets.items():
            if id(s) not in seen or item not in s:
                raise RuntimeError("DisjointSet is in an inconsistent state")


# ---------------------------------------------------------------------------
# Column equivalence classes from statement text
# ---------------------------------------------------------------------------


def _and_conjuncts(expr):
    from impala_spark.exprrules import Compound

    if isinstance(expr, Compound) and expr.op == "AND":
        for k in expr.kids:
            yield from _and_conjuncts(k)
    else:
        yield expr


def _walk_stmt(stmt, alias_to_table: dict[str, str], ds: DisjointSet) -> None:
    from impala_spark.exprrules import BinaryPred, ColumnRef
    from impala_spark.stmtrewriter import SelectStmt, UnionStmt

    if isinstance(stmt, UnionStmt):
        for op in stmt.operands:
            _walk_stmt(op, dict(alias_to_table), ds)
        return
    if not isinstance(stmt, SelectStmt):
        return
    scope = dict(alias_to_table)
    exprs = []
    for ref in stmt.table_refs:
        if ref.name is not None:
            scope[(ref.alias or ref.name).lower()] = ref.name.lower()
        if ref.inline_stmt is not None:
            _walk_stmt(ref.inline_stmt, scope, ds)
        if ref.on_expr is not None:
            exprs.append(ref.on_expr)
    if stmt.where is not None:
        exprs.append(stmt.where)

    def qualify(col: ColumnRef) -> str | None:
        parts = [p.lower() for p in col.path]
        if len(parts) == 2:
            return f"{scope.get(parts[0], parts[0])}.{parts[1]}"
        if len(parts) == 1 and len(scope) == 1:
            # single-table scope: an unqualified name is unambiguous
            return f"{next(iter(scope.values()))}.{parts[0]}"
        return None  # unqualified in a multi-table scope — skip

    for e in exprs:
        for conj in _and_conjuncts(e):
            # only top-level AND conjuncts transfer values; an equality
            # under OR/NOT does not (Analyzer.registerConjuncts)
            if (
                isinstance(conj, BinaryPred)
                and conj.op in ("=", "<=>")
                and isinstance(conj.kids[0], ColumnRef)
                and isinstance(conj.kids[1], ColumnRef)
            ):
                a, b = qualify(conj.kids[0]), qualify(conj.kids[1])
                if a is not None and b is not None and a != b:
                    ds.union(a, b)


def column_equiv_classes(sql: str) -> list[set[str]]:
    """Equivalence classes of ``table.column`` names implied by the
    statement's equi-join/WHERE conjuncts (the engine-level analog of the
    analyzer's equivClassMembers, A/Analyzer.java:277). Conservative:
    only column=column conjuncts under top-level ANDs of ON/WHERE count;
    subquery scopes and unresolvable names are skipped."""
    from impala_spark.stmtrewriter import parse_statement

    ds = DisjointSet()
    try:
        stmt = parse_statement(sql)
    except Exception:
        return []
    _walk_stmt(stmt, {}, ds)
    return sorted(
        (s for s in ds.get_sets() if len(s) > 1),
        key=lambda s: sorted(s),
    )


def colocation_advice(
    workload: Iterable[str],
    table_bytes: dict[str, int] | None = None,
) -> list[dict]:
    """Rank a workload's join-key equivalence classes by how many
    statements each appears in. Bucketing every table of a class on its
    member column — same column set, same bucket count (``CREATE TABLE
    ... PARTITION BY HASH(col) PARTITIONS n``) — turns those joins into
    zero-exchange colocated joins; the top of this list is the layout
    that de-shuffles the most of the workload.

    With ``table_bytes`` (table -> input size), each class also reports
    ``shuffle_bytes_per_use`` — the data a join on that class would
    otherwise move per statement — and equal-coverage ties rank the
    heavier class first: at 100 TB, de-shuffling two fact tables beats
    de-shuffling a dimension join appearing equally often."""
    counts: Counter[frozenset] = Counter()
    for sql in workload:
        seen: set[frozenset] = set()
        for cls in column_equiv_classes(sql):
            seen.add(frozenset(cls))
        for f in seen:
            counts[f] += 1
    out = []
    for cls, n in counts.most_common():
        tables = sorted({c.split(".")[0] for c in cls})
        entry = {
            "columns": sorted(cls),
            "tables": tables,
            "statements": n,
        }
        if table_bytes is not None:
            entry["shuffle_bytes_per_use"] = sum(
                table_bytes.get(t, 0) for t in tables
            )
        out.append(entry)
    # deterministic order: coverage first, heavier classes break ties
    out.sort(
        key=lambda d: (
            -d["statements"],
            -d.get("shuffle_bytes_per_use", 0),
            d["columns"],
        )
    )
    return out
