"""Column-tree move operations (SURVEY §2.9).

Re-expresses the reference move clause (api/move.kt:13-139) over Spark
schemas: columns live in an ordered tree (structs = groups), and a move
is remove-then-insert on that tree, compiled to ONE select with nested
``struct(...)`` builders — pure projection metadata, zero exchanges, so
the physical plan cost is nil at any scale.

Ordering semantics match the reference's insert machinery
(MoveTests.kt:14-23 batchGrouping):

- removing a node leaves a positional tombstone;
- a move target that CREATES a new top-level node places it at the
  moved column's own original top-level slot (so the first member of a
  new group pins the group's position);
- a target whose top-level node already exists appends under it (depth-
  first create of intermediate groups);
- ``to(i)`` / ``after(ref)`` insert into the post-removal flat order,
  exactly like ``MoveColsClause.to`` building
  ``subList(0,i) + removed + subList(i,n)``.

Selection paths are dotted strings. A path that exactly names a flat
column (even one whose name contains a dot, as in MoveTests'
``"a.b"``) resolves to that column first; otherwise segments descend
into structs.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class _Node:
    """One ordered column-tree node: a leaf (expr) or a group (children)."""

    __slots__ = ("name", "expr", "children")

    def __init__(self, name: str, expr: Column | None = None, children: list | None = None):
        self.name = name
        self.expr = expr
        self.children = children  # None => leaf

    @property
    def is_group(self) -> bool:
        return self.children is not None

    def to_expr(self) -> Column:
        if not self.is_group:
            return self.expr.alias(self.name)
        return F.struct(*[c.to_expr() for c in self.children]).alias(self.name)


class _Tombstone:
    """Positional placeholder for a removed top-level node."""

    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name


def _build_tree(df: DataFrame) -> list[_Node]:
    def node(field: T.StructField, expr: Column) -> _Node:
        if isinstance(field.dataType, T.StructType):
            kids = [node(f, expr.getField(f.name)) for f in field.dataType.fields]
            return _Node(field.name, children=kids)
        return _Node(field.name, expr=expr)

    return [node(f, F.col(f"`{f.name}`")) for f in df.schema.fields]


def _resolve(tree: list[_Node], path: tuple[str, ...]):
    """Locate a node: exact flat-name match first (names may contain
    dots), else descend struct segments. Returns (parents, index) where
    parents is the sibling list containing the node."""
    flat = ".".join(path)
    for i, n in enumerate(tree):
        if isinstance(n, _Node) and n.name == flat:
            return tree, i
    sibs, steps = tree, list(path)
    while steps:
        seg = steps.pop(0)
        idx = next(
            (i for i, n in enumerate(sibs) if isinstance(n, _Node) and n.name == seg), None
        )
        if idx is None:
            raise KeyError(f"move: no column at path {'.'.join(path)!r}")
        if not steps:
            return sibs, idx
        if not sibs[idx].is_group:
            raise KeyError(f"move: {seg!r} in {'.'.join(path)!r} is not a struct")
        sibs = sibs[idx].children
    raise KeyError(f"move: empty path")


def _prune_empty(tree: list[_Node]) -> None:
    """Drop groups emptied by removal, tombstoning at top level."""
    for i, n in enumerate(tree):
        if isinstance(n, _Node) and n.is_group:
            _prune_inner(n)
            if not n.children:
                tree[i] = _Tombstone(n.name)


def _prune_inner(group: _Node) -> None:
    for c in list(group.children):
        if c.is_group:
            _prune_inner(c)
            if not c.children:
                group.children.remove(c)


class KMoveClause:
    """`df.move("a", "b.c").into(...)/under(...)/to(...)` — see module doc."""

    def __init__(self, kdf, paths: Sequence[str]):
        self._kdf = kdf
        self._tree: list[_Node | _Tombstone] = _build_tree(kdf.df)
        self._moved: list[tuple[tuple[str, ...], _Node, str]] = []
        self._last_anchor_insert: dict[str, _Node] = {}
        for p in paths:
            path = tuple(p) if isinstance(p, (list, tuple)) else tuple(p.split("."))
            sibs, idx = _resolve([n for n in self._tree if isinstance(n, _Node)], path)
            node = sibs[idx]
            # anchor = the top-level entry the column came from; new
            # top-level insertions return to this slot (reference keeps
            # removed-node positions in its ColumnPosition tree)
            anchor = node.name if node in self._tree else path[0]
            if node in self._tree:
                # top-level removal leaves a positional tombstone
                self._tree[self._tree.index(node)] = _Tombstone(node.name)
            else:
                sibs.remove(node)
            self._moved.append((path, node, anchor))
        _prune_empty(self._tree)

    # -- terminal forms ---------------------------------------------------

    def _finish(self) -> "KDataFrame":
        from dataframe_kotlin_spark.core.frame import KDataFrame

        exprs = [n.to_expr() for n in self._tree if isinstance(n, _Node)]
        return KDataFrame(self._kdf.df.select(*exprs))

    def into(self, target) -> "KDataFrame":
        """Move each column to a new path. ``target`` is a dotted string /
        segment list (single column), or a callable ``path_tuple ->
        new_path`` applied per column (reference `into { ... }`,
        api/move.kt:80-92)."""
        if callable(target):
            return self._into_fn(lambda p, i: target(p))
        segs = list(target.split(".")) if isinstance(target, str) else list(target)
        if len(self._moved) > 1:
            raise ValueError("move(...).into(<path>): one target path needs exactly one column")
        return self._into_fn(lambda p, i: segs)

    def into_indexed(self, fn: Callable) -> "KDataFrame":
        """Per-column path with a running index (api/move.kt:73-78)."""
        return self._into_fn(lambda p, i: fn(p, i))

    def _into_fn(self, path_fn) -> "KDataFrame":
        for i, (path, node, anchor) in enumerate(self._moved):
            new_path = path_fn(path, i)
            new_path = list(new_path.split(".")) if isinstance(new_path, str) else list(new_path)
            if not new_path:
                raise ValueError("move.into: empty target path")
            node.name = new_path[-1]
            self._insert(new_path, node, anchor)
        return self._finish()

    def _insert(self, new_path: list[str], node: _Node, anchor: str) -> None:
        if len(new_path) == 1:
            self._insert_top(node, anchor)
            return
        top_name = new_path[0]
        top = next(
            (t for t in self._tree if isinstance(t, _Node) and t.name == top_name), None
        )
        if top is None:
            top = _Node(top_name, children=[])
            self._insert_top(top, anchor)
        elif not top.is_group:
            raise ValueError(f"move.into: {top_name!r} exists and is not a struct")
        sibs = top.children
        for seg in new_path[1:-1]:
            nxt = next((c for c in sibs if c.name == seg), None)
            if nxt is None:
                nxt = _Node(seg, children=[])
                sibs.append(nxt)
            elif not nxt.is_group:
                raise ValueError(f"move.into: {seg!r} exists and is not a struct")
            sibs = nxt.children
        sibs.append(node)

    def _insert_top(self, node: _Node, anchor: str) -> None:
        """Place a new top-level node back at its anchor's slot: before
        the anchor's tombstone (or after the anchor if it's still live),
        and after any node already re-inserted for the same anchor — so
        several columns from one source group come back adjacent, in
        move order (MoveTests batchUngrouping)."""
        prev = self._last_anchor_insert.get(anchor)
        if prev is not None and prev in self._tree:
            pos = self._tree.index(prev) + 1
        else:
            pos = None
            for i, t in enumerate(self._tree):
                if t.name == anchor:
                    pos = i if isinstance(t, _Tombstone) else i + 1
                    break
            if pos is None:
                pos = len(self._tree)
        self._tree.insert(pos, node)
        self._last_anchor_insert[anchor] = node

    def under(self, parent) -> "KDataFrame":
        """Move under a (possibly new) group, keeping leaf names
        (api/move.kt:59-66,94-96)."""
        segs = list(parent.split(".")) if isinstance(parent, str) else list(parent)
        return self._into_fn(lambda p, i: segs + [p[-1]])

    def to_top(self, name_fn: Callable | None = None) -> "KDataFrame":
        """Nested columns to top level; optional rename fn on the path
        (api/move.kt:68-70)."""
        return self._into_fn(lambda p, i: [name_fn(p) if name_fn else p[-1]])

    def to(self, index: int) -> "KDataFrame":
        """Flat positional insert into the post-removal top-level order
        (api/move.kt:98-101)."""
        live = [n for n in self._tree if isinstance(n, _Node)]
        moved = [n for (_, n, _) in self._moved]
        from dataframe_kotlin_spark.core.frame import KDataFrame

        ordered = live[:index] + moved + live[index:]
        return KDataFrame(self._kdf.df.select(*[n.to_expr() for n in ordered]))

    def to_left(self) -> "KDataFrame":
        return self.to(0)

    def to_right(self) -> "KDataFrame":
        return self.to(len([n for n in self._tree if isinstance(n, _Node)]))

    def after(self, ref: str) -> "KDataFrame":
        """Insert directly after a reference column, inside its parent
        (api/move.kt:103-135; 'before' is commented out in the reference
        too)."""
        ref_path = tuple(ref.split("."))
        live_top = [n for n in self._tree if isinstance(n, _Node)]
        sibs, idx = _resolve(live_top, ref_path)
        moved = [n for (_, n, _) in self._moved]
        for j, n in enumerate(moved):
            sibs.insert(idx + 1 + j, n)
        if sibs is live_top:
            # re-sync top-level order (tombstones dropped by insertion list)
            from dataframe_kotlin_spark.core.frame import KDataFrame

            return KDataFrame(self._kdf.df.select(*[n.to_expr() for n in sibs]))
        return self._finish()
