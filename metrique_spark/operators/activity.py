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

Spark shape: a cogrouped ``applyInPandas`` — docs and activities are
co-partitioned by ``_oid`` in one shuffle each, and the per-oid replay
(inherently sequential, list-mutating) runs vectorized-batch Python with
Arrow transfer. This is the designed escape hatch for semantics DataFrame
expressions can't state (SURVEY.md §2.7).
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


def activity_import(
    docs: DataFrame,
    activities: DataFrame,
    fields: Iterable[str] | None = None,
    cfield: str | None = None,
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
    """
    doc_cols = list(docs.columns)
    tracked = set(fields) if fields is not None else set(doc_cols)
    tracked &= set(doc_cols)
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

    def replay(doc_pdf: pd.DataFrame, act_pdf: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        if doc_pdf.empty:
            return pd.DataFrame(columns=out_cols)
        doc = doc_pdf.iloc[0].to_dict()
        doc["_e"] = None
        td_start = doc["_start"]
        acts_f = act_pdf[
            (act_pdf["when"] < td_start) & (act_pdf["field"].isin(tracked))
        ].sort_values("when", ascending=False, kind="mergesort")

        batch = [dict(doc)]
        for act in acts_f.itertuples(index=False):
            last = batch.pop()
            if last["_end"] is not None and pd.notna(last["_end"]) \
                    and last["_end"] == act.when:
                # same-instant change group: fold into the version the
                # previous activity already created
                new = dict(last)
                last = batch.pop()
            else:
                new = dict(last)
                new["_start"] = act.when
                new["_end"] = act.when
                last = dict(last)
                last["_start"] = act.when
            f = act.field
            if f in list_fields:
                # explicit None checks — Arrow hands lists over as numpy
                # arrays, whose truthiness raises
                removed = list(act.removed_list) if act.removed_list is not None else []
                added = list(act.added_list) if act.added_list is not None else []
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
                inconsistent = (None if cur is None else str(cur)) != act.added
                new[f] = act.removed
                marker = act.added
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
                return pd.DataFrame(columns=out_cols)

        for row in batch:
            out_rows.append({c: row.get(c) for c in out_cols})
        return pd.DataFrame(out_rows, columns=out_cols)

    return docs.groupBy("_oid").cogroup(
        acts.groupBy("_oid")
    ).applyInPandas(replay, schema=out_schema)
