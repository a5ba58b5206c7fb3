"""Activity-history reconstruction: rebuild historical object versions from
a field-level changelog, replayed backwards from the current state.

Reference semantics (``/root/reference/metrique/cubes/sqldata/generic.py:106-199``,
``_activity_import_doc`` / ``_activity_backwards``):

- input: one *current* doc per ``_oid`` plus activities
  ``(when, field, removed, added)``; only activities strictly before the
  doc's ``_start`` on tracked fields participate.
- replay newest→oldest: each activity splits the oldest known version at
  ``when`` (the older copy gets the pre-change value = ``removed``);
  activities sharing one timestamp are grouped into a single split
  (``generic.py:143-148``).
- list-valued fields replay element-wise: each ``added`` element is removed
  from the value (missing element ⇒ inconsistency), then ``removed``
  elements are appended back (``generic.py:186-199``).
- scalar fields: inconsistency iff the value being rolled back differs from
  ``added``; the value becomes ``removed`` either way.
- inconsistencies are recorded per field in ``_e`` (value = the ``added``
  that did not match, ``generic.py:160-167``) and replay continues.
- if ``cfield`` (creation field) is given and predates the oldest
  ``_start``, the oldest version is back-dated to it; if it doesn't predate
  it and there was nothing to replay, the doc yields NO versions
  (``generic.py:168-184``).

Spark shape: scalar-field tracking compiles to pure window functions
(zero Python, one Exchange+Sort); list-field replay streams through
``mapInPandas`` over an oid-co-partitioned union of docs + activities, so
each Arrow transfer carries thousands of oids (the per-oid replay is
inherently sequential and list-mutating — the designed escape hatch for
semantics DataFrame expressions can't state, SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# activities contract: scalar changes ride in `removed`/`added`; list-field
# changes in `removed_list`/`added_list` (the reference dispatches on the
# Python type of the changelog values, generic.py:186-187)
ACTIVITY_FIELDS = ("_oid", "when", "field", "removed", "added",
                   "removed_list", "added_list")


def _ensure_list_cols(acts: DataFrame) -> DataFrame:
    for c in ("removed_list", "added_list"):
        if c not in acts.columns:
            acts = acts.withColumn(c, F.lit(None).cast("array<string>"))
    return acts


def _doc_only_rows(no_act: DataFrame, doc_cols: list[str], cfield: str | None) -> DataFrame:
    """Docs that had no replayable activity: emit the doc itself, back-dated
    to ``cfield`` when that is earlier (reference generic.py:168-184)."""
    keep = no_act
    if cfield:
        keep = no_act.where(F.col(f"__d_{cfield}").isNotNull()
                            & (F.col(f"__d_{cfield}") < F.col("__d__start")))
        backdated = [
            (F.col(f"__d_{cfield}") if c == "_start" else F.col(f"__d_{c}"))
            .alias(c)
            for c in doc_cols if c != "_oid"
        ]
    else:
        backdated = [F.col(f"__d_{c}").alias(c) for c in doc_cols if c != "_oid"]
    return keep.select(
        "_oid", *backdated,
        F.lit(None).cast("map<string,string>").alias("_e"),
    )


def _activity_import_window(
    docs: DataFrame,
    activities: DataFrame,
    tracked: list[str],
    cfield: str | None,
) -> DataFrame:
    """Scalar-field fast path: the backwards replay expressed as window
    fills — zero Python, one shuffle on ``_oid`` for the heavy work.

    Key observation: with scalar fields, the reconstructed version starting
    at boundary ``t`` has, for each tracked field, the ``removed`` value of
    that field's FIRST activity strictly after ``t`` (none → the doc's
    final value). Inconsistency at activity ``j`` compares the value just
    after ``j`` with ``added_j`` and lands in ``_e`` of the version ending
    at ``when_j`` — all first()-over-following-window logic, no sequential
    state. Validated equivalent to the Python replay by the shared tests
    and the driver's changelog-reconstruction oracle.
    """
    from pyspark.sql import Window

    doc_cols = [c for c in docs.columns if c != "_e"]
    d = docs.select(*[F.col(c).alias(f"__d_{c}" if c != "_oid" else c)
                      for c in doc_cols])
    if not tracked:
        # nothing replayable with an empty tracked-scalar set — every doc
        # takes the docs-only branch (previously the mismatch fold over zero
        # fields raised AttributeError before any data was processed)
        return _doc_only_rows(d, doc_cols, cfield)
    acts = activities.join(
        d.select("_oid", F.col("__d__start").alias("__doc_start")), "_oid"
    ).where(
        (F.col("when") < F.col("__doc_start")) & F.col("field").isin(tracked)
    ).select("_oid", "when", "field", "removed", "added")

    # row kinds share one (t, rank) ordering: zero-width version (0) sees
    # same-instant acts; acts (1) see strictly-later acts; versions (2)
    # see strictly-later acts only. All three kinds come out of ONE pass
    # over acts: window-tag each activity row (first-at-instant emits the
    # version-boundary row, first-at-min-instant also emits the zero-width
    # row), then explode — a self-union would scan and shuffle acts 3×.
    w_inst = Window.partitionBy("_oid", "when").orderBy("field", "removed",
                                                        "added")
    w_oid = Window.partitionBy("_oid")
    tagged = (
        acts.withColumn("__rn_inst", F.row_number().over(w_inst))
        .withColumn("__min_t", F.min("when").over(w_oid))
    )
    null_s = F.lit(None).cast("string")
    kinds = F.array(
        F.struct(F.lit(1).alias("__rank"), F.col("field"),
                 F.col("removed"), F.col("added")),
        F.when(F.col("__rn_inst") == 1,
               F.struct(F.lit(2).alias("__rank"), null_s.alias("field"),
                        null_s.alias("removed"), null_s.alias("added"))),
        F.when((F.col("__rn_inst") == 1) & (F.col("when") == F.col("__min_t")),
               F.struct(F.lit(0).alias("__rank"), null_s.alias("field"),
                        null_s.alias("removed"), null_s.alias("added"))),
    )
    u = (
        tagged.select(
            "_oid", F.col("when").alias("__t"),
            # explode the raw array and drop the null slots afterwards: a
            # higher-order filter() lambda evaluates interpreted per row,
            # outside codegen — measured ~1s slower at sf0.1
            F.explode(kinds).alias("__k"),
        )
        .where(F.col("__k").isNotNull())
        .select("_oid", "__t", F.col("__k.__rank").alias("__rank"),
                F.col("__k.field").alias("field"),
                F.col("__k.removed").alias("removed"),
                F.col("__k.added").alias("added"))
        .join(d, "_oid")
    )

    # "first strictly-following activity of field f" computed as a
    # cumulative last() over DESCENDING order: [unboundedPreceding, -1]
    # frames update incrementally (O(n) per partition), whereas a
    # [1, unboundedFollowing] frame re-scans the remainder per row (O(n²) —
    # measured 16s vs 4s at sf0.1 on ~700-row partitions)
    fill_w = (
        Window.partitionBy("_oid")
        .orderBy(F.col("__t").desc(), F.col("__rank").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for f in tracked:
        # the rollback value rides inside a struct so a legitimate NULL
        # `removed` (field rolled back to empty) stays distinguishable from
        # "no later activity" — last(ignorenulls) skips bare NULLs, which
        # would silently fall back to the doc value
        nxt = F.last(
            F.when(F.col("field") == f,
                   F.struct(F.col("removed").alias("v"))),
            ignorenulls=True,
        ).over(fill_w)
        u = u.withColumn(
            f"__v_{f}",
            F.when(nxt.isNotNull(), nxt["v"])
            .otherwise(F.col(f"__d_{f}").cast("string")),
        )

    # inconsistencies: activity j mismatches when the value just after it
    # (its own fill) differs from added_j. The reference deep-copies each
    # younger version into the older one it splits off (generic.py:144-167),
    # so _e ACCUMULATES down the history: the version at boundary t carries,
    # per field, the `added` of the OLDEST mismatching activity at any
    # instant after t (older acts overwrite the field key as the copy chain
    # extends). That is exactly a cumulative last()-fill of mismatch values
    # over the same descending order the value fills use — evaluated AT the
    # version row itself, whose [unboundedPreceding, 0] frame covers
    # precisely the strictly-newer instants (and, for the zero-width row,
    # its own instant's activities, which sort before it).
    val_after = None
    for f in tracked:
        v = F.when(F.col("field") == f, F.col(f"__v_{f}"))
        val_after = v if val_after is None else F.coalesce(val_after, v)
    mism_cond = (F.col("__rank") == 1) & ~val_after.eqNullSafe(F.col("added"))
    fill_w0 = (
        Window.partitionBy("_oid")
        .orderBy(F.col("__t").desc(), F.col("__rank").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    entries = []
    for f in tracked:
        # same struct wrapper: a mismatch whose `added` is NULL still counts
        cum = F.last(
            F.when(mism_cond & (F.col("field") == f),
                   F.struct(F.col("added").alias("v"))),
            ignorenulls=True,
        ).over(fill_w0)
        entries.append(
            F.when(cum.isNotNull(),
                   F.struct(F.lit(f).alias("key"), cum["v"].alias("value")))
        )
    if entries:
        arr = F.array_compact(F.array(*entries))
        u = u.withColumn(
            "__e_all", F.when(F.size(arr) > 0, F.map_from_entries(arr))
        )
    else:
        u = u.withColumn(
            "__e_all", F.lit(None).cast("map<string,string>")
        )

    vers = u.where(F.col("__rank") != 1)
    # "next boundary" = lag over the SAME descending order the fill window
    # uses (lag on the reversed sort ≡ lead on the ascending one) — keeps
    # every window in one Exchange+Sort pass instead of re-sorting ascending
    lead_w = Window.partitionBy("_oid").orderBy(
        F.col("__t").desc(), F.col("__rank").desc())
    if cfield:
        # oldest (zero-width) version back-dates to creation when earlier
        # (generic.py:168-184)
        backdate = (
            (F.col("__rank") == 0)
            & F.col(f"__d_{cfield}").isNotNull()
            & (F.col(f"__d_{cfield}") < F.col("__t"))
        )
        start_col = F.when(backdate, F.col(f"__d_{cfield}")).otherwise(F.col("__t"))
    else:
        start_col = F.col("__t")
    vers = vers.withColumn("_start", start_col).withColumn(
        "_end",
        # zero-width version ends at its own instant (generic.py:146-148);
        # normal versions end at the next boundary, last one stays open
        F.when(F.col("__rank") == 0, F.col("__t")).otherwise(
            F.lag("__t").over(lead_w)
        ),
    ).withColumn("_e", F.col("__e_all"))

    out_vals = [F.col("_oid")]
    for c in doc_cols:
        if c == "_oid":
            continue
        if c in ("_start", "_end"):
            out_vals.append(F.col(c))
        elif c in tracked:
            out_vals.append(F.col(f"__v_{c}").cast(docs.schema[c].dataType).alias(c))
        else:
            out_vals.append(F.col(f"__d_{c}").alias(c))
    with_acts = vers.select(*out_vals, F.col("_e"))

    # oids with no replayable activity: the doc itself (generic.py:168-184)
    no_act = d.join(acts.select("_oid").distinct(), "_oid", "left_anti")
    doc_rows = _doc_only_rows(no_act, doc_cols, cfield)
    return with_acts.unionByName(doc_rows)


def activity_import(
    docs: DataFrame,
    activities: DataFrame,
    fields: Iterable[str] | None = None,
    cfield: str | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Reconstruct full version history for each doc from its changelog.

    Args:
        docs: current-state docs, one row per ``_oid``, with ``_start`` and
            ``_end`` columns (epoch of extraction / None).
        activities: changelog rows ``(_oid, when, field, removed, added
            [, removed_list, added_list])``.
        fields: tracked field names (default: every activity ``field`` that
            is also a doc column).
        cfield: optional creation-timestamp column on the doc used to
            back-date the first version.

    Returns one row per reconstructed version, same schema as ``docs`` plus
    an ``_e`` map<string,string> of per-field inconsistencies.

    ``strategy``: 'window' = pure window-function fast path (scalar fields
    only — zero Python); 'python' = streamed backwards replay (required
    for list fields); 'auto' picks per the tracked fields' types.
    """
    doc_cols = list(docs.columns)
    tracked = set(fields) if fields is not None else set(doc_cols)
    tracked &= set(doc_cols)

    if strategy == "auto":
        has_list = any(
            isinstance(docs.schema[f].dataType, T.ArrayType)
            for f in tracked if f in docs.columns
        )
        strategy = "python" if has_list else "window"
    if strategy == "window":
        scalar_tracked = sorted(
            tracked - {"_oid", "_start", "_end", "_e"}
        )
        return _activity_import_window(docs, activities, scalar_tracked, cfield)
    acts = _ensure_list_cols(activities).select(*ACTIVITY_FIELDS)

    out_fields = [f for f in docs.schema.fields if f.name != "_e"]
    out_schema = T.StructType(
        out_fields
        + [T.StructField("_e", T.MapType(T.StringType(), T.StringType()), True)]
    )
    out_cols = [f.name for f in out_schema.fields]
    list_fields = {
        f.name for f in docs.schema.fields if isinstance(f.dataType, T.ArrayType)
    }

    def _replay_one(doc: dict, act_dicts: list[dict]) -> list[dict]:
        doc = dict(doc)
        doc["_e"] = None
        td_start = doc["_start"]
        # arrival order is already (when desc) from the JVM sort; keep only
        # replayable activities (strictly before _start, tracked field)
        acts_f = [a for a in act_dicts
                  if a["when"] is not None and pd.notna(a["when"])
                  and a["when"] < td_start and a["field"] in tracked]

        batch = [doc]
        for act in acts_f:
            last = batch.pop()
            if last["_end"] is not None and pd.notna(last["_end"]) \
                    and last["_end"] == act["when"]:
                # same-instant change group: fold into the version the
                # previous activity already created
                new = dict(last)
                last = batch.pop()
            else:
                new = dict(last)
                new["_start"] = act["when"]
                new["_end"] = act["when"]
                last = dict(last)
                last["_start"] = act["when"]
            f = act["field"]
            if f in list_fields:
                # explicit None checks — Arrow hands lists over as numpy
                # arrays, whose truthiness raises
                removed = list(act["removed_list"]) \
                    if act["removed_list"] is not None else []
                added = list(act["added_list"]) \
                    if act["added_list"] is not None else []
                val = list(new[f]) if new[f] is not None else []
                inconsistent = False
                for ad in added:
                    if ad in val:
                        val.remove(ad)
                    else:
                        inconsistent = True
                val.extend(removed)
                new[f] = val
                marker = ",".join(added)
            else:
                cur = new[f]
                inconsistent = (None if cur is None else str(cur)) != act["added"]
                new[f] = act["removed"]
                marker = act["added"]
            if inconsistent:
                new["_e"] = dict(new.get("_e") or {})
                new["_e"][f] = marker
            batch.extend([last, new])

        # back-date the oldest version to the creation field when it helps
        # (generic.py:168-184); no replay + no back-date ⇒ no versions
        if cfield:
            oldest = batch[-1]
            created = oldest.get(cfield)
            if created is not None and pd.notna(created) \
                    and created < oldest["_start"]:
                oldest["_start"] = created
            elif len(batch) == 1:
                return []
        return [{c: row.get(c) for c in out_cols} for row in batch]

    # One Python/Arrow round trip PER ARROW BATCH, not per oid: docs and
    # activities ride one oid-co-partitioned union (doc row first, then its
    # activities newest→oldest, guaranteed by the within-partition sort), and
    # a mapInPandas stream replays oids as they flow past. A cogrouped
    # applyInPandas has per-key invocation overhead — with millions of tiny
    # groups at 100 TB that overhead dominates; here thousands of oids share
    # each Arrow transfer. State spans batch boundaries inside a partition;
    # an oid never spans partitions (hash repartition on _oid).
    doc_fields = [f for f in docs.schema.fields if f.name != "_e"]
    doc_struct = T.StructType(doc_fields)
    act_fields = [f for f in acts.schema.fields if f.name != "_oid"]
    act_struct = T.StructType(act_fields)
    merged = docs.select(
        "_oid", F.lit(0).alias("__kind"),
        F.struct(*[F.col(f.name) for f in doc_fields]).alias("__doc"),
        F.lit(None).cast(act_struct).alias("__act"),
    ).unionByName(acts.select(
        "_oid", F.lit(1).alias("__kind"),
        F.lit(None).cast(doc_struct).alias("__doc"),
        F.struct(*[F.col(f.name) for f in act_fields]).alias("__act"),
    ))
    part = merged.repartition("_oid").sortWithinPartitions(
        "_oid", "__kind", F.col("__act")["when"].desc()
    )

    def replay_stream(batches):
        cur_oid = None
        cur_doc = None
        cur_acts: list[dict] = []
        out_rows: list[dict] = []

        def flush():
            if cur_doc is not None:
                out_rows.extend(_replay_one(cur_doc, cur_acts))

        for pdf in batches:
            for oid, kind, doc, act in zip(
                pdf["_oid"], pdf["__kind"], pdf["__doc"], pdf["__act"]
            ):
                if kind == 0:
                    flush()
                    cur_oid, cur_doc, cur_acts = oid, doc, []
                elif oid == cur_oid:
                    cur_acts.append(act)
                else:
                    # activities for an oid with no doc row: no versions
                    flush()
                    cur_oid, cur_doc, cur_acts = oid, None, []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=out_cols)
                out_rows = []
        flush()
        yield pd.DataFrame(out_rows, columns=out_cols)

    return part.mapInPandas(replay_stream, schema=out_schema)
