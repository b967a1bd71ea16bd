"""SQL DML semantics as a Python API: MERGE INTO / UPDATE / DELETE.

Reference: ``sql/hudi/command/MergeIntoHoodieTableCommand.scala`` +
``ExpressionPayload.scala`` serialize the matched/not-matched Catalyst
expressions into the write config and evaluate them per record inside
the upsert merge. We stay inside one Spark job, so the "expression
payload" is literally a Payload whose Column expressions encode the
WHEN clauses — no serialization, codegen comes free from Catalyst.

Condition/assignment expressions reference the stored row via
``tgt("col")`` and the incoming row via ``src("col")``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DELETE_MARKER_COL, META_COLS, PARTITION_PATH_COL, RECORD_KEY_COL
from ..payloads import HAS_NEW, HAS_OLD, NEW, OLD, Payload


def tgt(col: str) -> Column:
    """The stored (target-table) value in a MERGE condition/assignment."""
    return F.col(OLD + col)


def src(col: str) -> Column:
    """The incoming (source) value in a MERGE condition/assignment."""
    return F.col(NEW + col)


class ExpressionPayload(Payload):
    """WHEN-clause semantics over the merge frame
    (``sql/hudi/command/payload/ExpressionPayload.scala:55-189``):

    - matched & delete_condition        → drop row
    - matched & update_condition        → apply update assignments
    - matched & neither                 → keep stored row
    - not matched & insert_condition    → insert source row
    - not matched & !insert_condition   → ignore source row
    """

    name = "expression"
    requires_stored_merge = True  # WHEN-clauses read the stored row

    def __init__(
        self,
        precombine_field: str | None,
        update_condition: Column | None,
        update_assignments: dict[str, Column] | None,
        delete_condition: Column | None,
        insert_condition: Column | None,
    ):
        super().__init__(precombine_field)
        self.update_condition = update_condition
        self.update_assignments = update_assignments
        self.delete_condition = delete_condition
        self.insert_condition = insert_condition

    def _matched_update(self) -> Column:
        cond = self.update_condition if self.update_condition is not None else F.lit(True)
        return F.col(HAS_OLD) & cond

    def _not_matched_insert(self) -> Column:
        cond = self.insert_condition if self.insert_condition is not None else F.lit(True)
        return ~F.col(HAS_OLD) & cond

    def take_new(self) -> Column:
        return F.col(HAS_NEW) & (self._matched_update() | self._not_matched_insert())

    def is_delete(self) -> Column:
        if self.delete_condition is None:
            return F.lit(False)
        # reference processMatchedRecord (ExpressionPayload.scala:95-135):
        # update conditions are tested FIRST; the delete condition applies
        # only when NO update condition matched — without this, a row
        # satisfying both an UPDATE clause and a DELETE clause would be
        # deleted instead of updated
        upd = (
            self.update_condition
            if self.update_condition is not None
            else F.lit(True)
        )
        return (
            F.col(HAS_NEW)
            & F.col(HAS_OLD)
            & ~F.coalesce(upd, F.lit(False))
            & F.coalesce(self.delete_condition, F.lit(False))
        )

    def pure_insert_gate(self) -> Column | None:
        # no WHEN NOT MATCHED → insert_condition is lit(False): drop all;
        # conditional insert → keep only rows satisfying the condition;
        # unconditional insert (None) → no gate needed
        if self.insert_condition is None:
            return None
        return F.coalesce(self.insert_condition, F.lit(False))

    def value(self, col: str) -> Column:
        new_val = F.col(NEW + col)
        if not self.update_assignments:
            return new_val
        assigned = self.update_assignments.get(col)
        if assigned is None:
            # matched-update keeps unassigned target columns
            return F.when(self._matched_update(), F.col(OLD + col)).otherwise(new_val)
        return F.when(self._matched_update(), assigned).otherwise(new_val)


def merge_into(
    table,
    source: DataFrame,
    matched_update: dict[str, Column] | str | None = "all",
    matched_condition: Column | None = None,
    matched_delete: Column | None = None,
    not_matched_insert: bool = True,
    not_matched_condition: Column | None = None,
) -> str:
    """MERGE INTO table USING source ON <record key>.

    The join condition is the table's record key (the reference also
    requires the merge key to contain the record key —
    ``MergeIntoHoodieTableCommand.scala:63``)."""
    from ..operators.write import run_batch_write
    from ..config import WriteOperation

    if matched_update is None:
        assignments, update_cond = None, F.lit(False)  # no WHEN MATCHED UPDATE
    elif matched_update == "all":
        assignments = None  # UPDATE SET * — take the full source row
        update_cond = matched_condition if matched_condition is not None else F.lit(True)
    else:
        assignments = dict(matched_update)
        update_cond = matched_condition if matched_condition is not None else F.lit(True)
    insert_cond = None if not_matched_insert else F.lit(False)
    if not_matched_insert and not_matched_condition is not None:
        insert_cond = not_matched_condition
    payload = ExpressionPayload(
        table.cfg.precombine_field,
        update_condition=update_cond,
        update_assignments=assignments,
        delete_condition=matched_delete,
        insert_condition=insert_cond,
    )
    return run_batch_write(table, source, WriteOperation.UPSERT, payload=payload)


def update_where(table, condition: Column, assignments: dict[str, Column]) -> str:
    """UPDATE t SET ... WHERE ... → read → filter → assign → upsert
    (``sql/hudi/command/UpdateHoodieTableCommand.scala``)."""
    from ..config import FILE_ID_COL

    snap = table.snapshot().filter(condition)
    for c, expr in assignments.items():
        snap = snap.withColumn(c, expr)
    # keep the stamped key/partition/file-id columns: stamp_keys() skips
    # recomputation and the write skips the index join (rows were just
    # read from storage, so their location is current — pre_tagged)
    drop = [
        c for c in META_COLS
        if c not in (RECORD_KEY_COL, PARTITION_PATH_COL, FILE_ID_COL)
    ]
    return table.upsert(snap.drop(*drop, DELETE_MARKER_COL), pre_tagged=True)


def delete_where(table, condition: Column) -> str:
    """DELETE FROM t WHERE ...
    (``sql/hudi/command/DeleteHoodieTableCommand.scala``)."""
    from ..config import FILE_ID_COL

    keys = table.snapshot().filter(condition).select(
        RECORD_KEY_COL, PARTITION_PATH_COL, FILE_ID_COL
    )
    return table.delete(keys, pre_tagged=True)
