"""Grouped-map (applyInPandas) variant of the GEDCOM extraction.

SURVEY.md §2 op 3 names two candidate physical strategies for the
per-record tree walk: the per-level window stack (extract.py — all-JVM,
declarative) and a per-record-group pandas walk (this module). Both are
kept, semantically identical (tests assert exact output equality,
including on the hypothesis-generated corpus), so the engine can choose
by workload and the tradeoff stays measured instead of assumed:

- window stack: no Python in the path, whole-stage codegen, but ~14
  window expressions over every line and a broadcast self-join for EVEN
  promotion; the frame is computed once per sink unless persisted.
- grouped map: ONE shuffle on record_seq and a linear pure-Python walk
  per record (records are small — spec nesting <= 99, practice < 10),
  emitting node properties and edges in the same pass; the cost is
  Arrow-transferring every line through a Python worker.

Measured (synth 50k records / 350k lines, local[32], warm): window
variant 2.2 s (after collapsing the window stack to one exec per frame
spec), grouped variant 24.4 s — per-record groups are tiny (7 lines),
so the grouped map pays ~10x in per-group pandas overhead.
The window stack is therefore the default engine path; the grouped
variant remains the right shape when per-record logic outgrows what
column expressions can say (custom per-record ML featurization, deeply
data-dependent walks), and its exact-equality tests keep both honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from node_gedcom_graph_spark.functions.dictionaries import (
    BOOLEAN_TAGS,
    GEDCOM_TAGS,
    TEMPLE_CODES,
)

# Unified output: nodes and edges share one schema (applyInPandas emits
# a single shape); split downstream by `kind`.
_OUT_SCHEMA = (
    "record_seq long, kind string, record_id string, label string, "
    "root_tag string, k1 string, k2 string, v string, line_no long"
)


def _walk_record(rows, out):
    """Reference-faithful walk over one record's lines (sorted by
    line_no). Mirrors extract.py exactly; pinned by equality tests."""
    seq = rows[0][0]
    _, _, level0, xref0, tag0, _ = rows[0]
    label = GEDCOM_TAGS.get(tag0)
    if level0 != 0 or label is None:
        return
    root_id = xref0

    # children trees via a level stack:
    # node = [tag, xref, value, children, line_no]
    root = [tag0, xref0, "", [], rows[0][1]]
    stack = {0: root}
    for _, line_no, level, xref, tag, value in rows[1:]:
        node = [tag, xref, value, [], line_no]
        parent = stack.get(level - 1)
        if parent is None:
            continue  # malformed nesting: trust-the-producer, skip
        parent[3].append(node)
        stack[level] = node
        for deeper in [k for k in stack if k > level]:
            del stack[deeper]

    props: dict[str, tuple[str, int]] = {}
    if root_id is not None:
        props["Gedcom Id:ID"] = (root_id, -1)

    def walk(node, prefix):
        for ch in node[3]:
            tag, xref, v, children, ln = ch
            friendly = GEDCOM_TAGS.get(tag)
            if friendly is None:
                continue
            guard = (v != "") or not children
            if guard and v.startswith("@"):
                if root_id is not None:
                    out.append(
                        (seq, "edge", root_id, label, tag0,
                         v.replace("@", ""), friendly, tag, ln)
                    )
            elif guard and not (tag == "TYPE" and node[0] == "EVEN"):
                if tag == "NAME":
                    pieces = v.split("/")
                    has_slash = "/" in v
                    given = (
                        v if not has_slash
                        else pieces[0] if pieces[0].strip() else None
                    )
                    surname = (
                        pieces[1]
                        if has_slash and len(pieces) >= 2 and pieces[1].strip()
                        else None
                    )
                    if given is not None:
                        props[" ".join(prefix + ["Given Name"])] = (given, ln)
                    if surname is not None:
                        props[" ".join(prefix + ["Surname"])] = (surname, ln)
                    props[" ".join(prefix + [friendly])] = (v, ln)
                else:
                    if tag in BOOLEAN_TAGS:
                        ov = "True" if v else "False"
                    elif tag == "TEMP":
                        ov = TEMPLE_CODES.get(v, v)
                    elif tag == "PLAC" and v in TEMPLE_CODES:
                        ov = TEMPLE_CODES[v] + " Temple"
                    else:
                        ov = v
                    props[" ".join(prefix + [friendly])] = (ov, ln)
            if children:
                segment = friendly
                if tag == "EVEN":
                    types = [g[2] for g in children if g[0] == "TYPE"]
                    if types:
                        segment = types[-1]
                if xref is not None:
                    props[" ".join(prefix + [segment, "Gedcom Id:ID"])] = (xref, ln)
                walk(ch, prefix + [segment])

    walk(root, [])
    for key, (val, ln) in props.items():
        out.append((seq, "node", root_id, label, tag0, key, None, val, ln))


def extract_grouped(lines: DataFrame) -> DataFrame:
    """One applyInPandas pass: (record_seq-grouped lines) -> unified
    node-property + edge rows. Split with ``nodes_of``/``edges_of``."""

    def process(pdf):
        import pandas as pd

        pdf = pdf.sort_values("line_no")
        out = []
        rows = list(
            zip(
                pdf["record_seq"], pdf["line_no"], pdf["level"],
                pdf["xref"], pdf["tag"], pdf["value"],
            )
        )
        rows = [
            (s, l, lv, None if x is None or (isinstance(x, float)) else x, t, v)
            for (s, l, lv, x, t, v) in rows
        ]
        if rows:
            _walk_record(rows, out)
        return pd.DataFrame(
            out,
            columns=[
                "record_seq", "kind", "record_id", "label", "root_tag",
                "k1", "k2", "v", "line_no",
            ],
        )

    return lines.groupBy("record_seq").applyInPandas(process, _OUT_SCHEMA)


def nodes_of(unified: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        unified.filter(F.col("kind") == "node")
        .select(
            "record_seq", "record_id", "label", "root_tag",
            F.col("k1").alias("flat_key"), F.col("v").alias("value"),
        )
    )


def edges_of(unified: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        unified.filter(F.col("kind") == "edge")
        .select(
            F.col("record_id").alias("src"), F.col("k1").alias("dst"),
            F.col("k2").alias("rel_type"), F.col("v").alias("edge_tag"),
        )
    )
