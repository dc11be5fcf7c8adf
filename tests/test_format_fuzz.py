"""Property-based cross-format fuzz: a RANDOM sequence of append /
delete-by-key-predicate operations applied through all three table stacks
(TxTable private log, Delta _delta_log, Iceberg v2 metadata) must agree
with a pure-Python list model at the end, and the create snapshot must
stay intact under time travel. Iceberg alternates its two merge-on-read
delete flavors (position deletes and equality deletes) and Delta
alternates copy-on-write deletes with deletion vectors across the
sequence, so the fuzz also pins that every MoR delete flavor is
equivalent to a copy-on-write delete for key-only predicates evaluated
over the live table."""

import os
import shutil
import tempfile
import uuid

from hypothesis import given, settings, strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.deltalog import DeltaTable
from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.iceberg import IcebergTable
from copy_sharepoint_to_onelake_lakehousefiles_spark.plans.txtable import TxTable

DDL = "k long, v long"

row = st.tuples(
    st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=99)
)
append_op = st.tuples(st.just("append"), st.lists(row, min_size=1, max_size=4))
delete_op = st.tuples(st.just("delete"), st.integers(2, 4), st.integers(0, 3))
ops_seq = st.lists(st.one_of(append_op, delete_op), min_size=1, max_size=4)
initial = st.lists(row, min_size=1, max_size=5)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@settings(max_examples=8, deadline=None)
@given(init=initial, ops=ops_seq)
def test_random_op_sequences_agree_across_formats(spark, init, ops):
    base = os.path.join(tempfile.gettempdir(), f"fuzz_{uuid.uuid4().hex[:8]}")
    try:
        c_df = spark.createDataFrame(init, DDL)
        tx = TxTable.create(spark, os.path.join(base, "tx"), c_df, key="k")
        dl = DeltaTable.create(spark, os.path.join(base, "dl"), c_df)
        ic = IcebergTable.create(spark, os.path.join(base, "ic"), c_df)
        model = list(init)
        for i, op in enumerate(ops):
            if op[0] == "append":
                _, rows = op
                a_df = spark.createDataFrame(rows, DDL)
                tx.append(a_df)
                dl.append(a_df)
                ic.append(a_df)
                model.extend(rows)
            else:
                _, m, r = op
                r = r % m
                pred = f"k % {m} = {r}"
                tx.delete(pred)
                if i % 2 == 0:  # alternate Delta CoW delete vs deletion vectors
                    dl.delete_vectors(pred)
                else:
                    dl.delete(pred)
                if i % 2 == 0:  # alternate Iceberg's two MoR delete flavors
                    ic.position_delete(pred)
                else:
                    keys = [(k,) for k in range(10) if k % m == r]
                    ic.equality_delete(spark.createDataFrame(keys, "k long"))
                model = [t for t in model if t[0] % m != r]
        expected = sorted(model)
        assert _rows(tx.read()) == expected, "TxTable diverges from model"
        assert _rows(dl.read()) == expected, "Delta diverges from model"
        assert _rows(ic.read()) == expected, "Iceberg diverges from model"
        # the create snapshot is immutable under every stack
        first = sorted(init)
        assert _rows(tx.read(0)) == _rows(dl.read(0)) == first
        assert _rows(ic.read(index=0)) == first
    finally:
        shutil.rmtree(base, ignore_errors=True)
