"""Physical-plan lint helpers: detect partition-less window operators.

``Window.orderBy(...)`` with no ``partitionBy`` compiles to a WindowExec
whose partition spec is empty -- Spark itself warns "No Partition Defined
for Window operation! Moving all data to a single partition". Over a
bounded spine (day grain, decile grain, top-k output) that is fine; over
data-sized grain it is the one plan shape that cannot scale, and
``operators/ranking.py`` exists to replace it. ``tests/test_plans.py``
lints every registry query with these helpers so the class cannot creep
back in (VERDICT r7 "What's wrong" #1 / "Next round" #3).

Detection is on the executedPlan text. A window expression prints as

    windowspecdefinition(part1#1L, part2#2L, ord#3L ASC NULLS FIRST,
                         specifiedwindowframe(...))

i.e. partition columns first (plain expressions), then order specs (each
carrying an ASC/DESC direction), then the frame. A partition-less window
is therefore one whose FIRST top-level argument is already a sort spec
(or directly the frame): there are no plain partition columns in front.
This distinguishes the real offender from a partitionBy-without-orderBy
window (first arg a plain column), which the naive bracket-group count
misreads.

``WindowGroupLimit`` (Spark's top-k-per-group pushdown) prints its
partition and order specs as leading bracket groups:

    WindowGroupLimit [p#1L], [o#2L DESC], rank(...), k, Mode

with the partition group absent when empty -- so it is partition-less
iff the first bracket group is a sort spec.
"""

from __future__ import annotations

__all__ = ["partitionless_windows"]


def _toplevel_args(s: str) -> list[str]:
    """Split a parenthesized argument list body at top-level commas."""
    args, depth, cur = [], 0, ""
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            args.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        args.append(cur.strip())
    return args


def _is_sort_spec(arg: str) -> bool:
    return " ASC " in arg + " " or " DESC " in arg + " " or arg.endswith((" ASC", " DESC"))


def _windowspec_bodies(plan: str) -> list[str]:
    """Every windowspecdefinition(...) argument body in the plan text."""
    bodies = []
    key = "windowspecdefinition("
    i = 0
    while True:
        j = plan.find(key, i)
        if j < 0:
            return bodies
        depth, k = 1, j + len(key)
        start = k
        while k < len(plan) and depth:
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        bodies.append(plan[start : k - 1])
        i = k


def _bracket_groups(line: str) -> list[str]:
    groups, depth, cur = [], 0, None
    for ch in line:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
                cur = None
                continue
        if cur is not None:
            cur += ch
    return groups


def partitionless_windows(plan: str) -> list[str]:
    """Evidence strings for every partition-less window in a plan text.

    Returns one entry per offending windowspecdefinition (its argument
    body) and per offending WindowGroupLimit line; empty list = clean.
    """
    hits = []
    for body in _windowspec_bodies(plan):
        args = _toplevel_args(body)
        if not args:
            continue
        first = args[0]
        if first.startswith("specifiedwindowframe") or _is_sort_spec(first):
            hits.append(f"windowspecdefinition({body[:120]}")
    for raw in plan.splitlines():
        s = raw.strip().lstrip("+-: *").strip()
        if s.startswith("WindowGroupLimit "):
            groups = _bracket_groups(s)
            first_args = _toplevel_args(groups[0]) if groups else []
            # missing partition group, an EMPTY '[]' partition group, or a
            # first group that is already the sort spec all mean global
            if not first_args or _is_sort_spec(first_args[0]):
                hits.append(s[:140])
    return hits
