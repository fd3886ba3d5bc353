"""M8 collection widening: list<string> and struct value columns through
derive → envelope → only-updated, mirroring the reference's collection
transition matrix (ScyllaTypesAllBase.java: add / remove / set-NULL / empty /
unmodified are all distinct states; ScyllaSchema.java:340-389)."""

import pyarrow as pa
import pyarrow.compute as pc

from scylla_cdc_source_connector_ray.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_ray.schema import COLLECTION_VALUE_COLS, META_TYPE, TAGS_TYPE
from scylla_cdc_source_connector_ray.stages.envelope import build_envelope, flatten_envelope
from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops


def _log(rows):
    """rows: (conv, turn, role, text, tool, tags, meta, ts_us, seq)"""
    cols = list(zip(*rows))
    return pa.table(
        {
            "conv_id": pa.array(cols[0], pa.string()),
            "turn_idx": pa.array(cols[1], pa.int32()),
            "role": pa.array(cols[2], pa.string()),
            "text": pa.array(cols[3], pa.string()),
            "tool": pa.array(cols[4], pa.string()),
            "tags": pa.array(cols[5], TAGS_TYPE),
            "meta": pa.array(cols[6], META_TYPE),
            "ts": pa.array(cols[7], pa.timestamp("us")),
            "seq": pa.array(cols[8], pa.int64()),
        }
    )


# one key, a transition chain covering the reference's scenarios:
#   c: tags=[a]        meta={1,x}
#   u: tags=[a,b]      (element added)        meta unchanged  -> modified: tags
#   u: tags unchanged  meta={2,x} (field chg)                 -> modified: meta,text*
#   u: tags=[]         (emptied, NOT null)                    -> modified: tags,text*
#   u: tags=NULL       (set-to-NULL ≠ empty)                  -> modified: tags,text*
#   d: tombstone (text NULL) -> after all NULL
#   u: re-insert after delete ('c' is only the key's FIRST row, per the
#      engine spec + oracle row_number()=1) -> before is the delete's NULL state
ROWS = [
    ("c1", 0, "user", "t0", None, ["a"], {"k": 1, "src": "x"}, 1_000, 0),
    ("c1", 0, "user", "t0", None, ["a", "b"], {"k": 1, "src": "x"}, 2_000, 1),
    ("c1", 0, "user", "t1", None, ["a", "b"], {"k": 2, "src": "x"}, 3_000, 2),
    ("c1", 0, "user", "t2", None, [], {"k": 2, "src": "x"}, 4_000, 3),
    ("c1", 0, "user", "t3", None, None, {"k": 2, "src": "x"}, 5_000, 4),
    ("c1", 0, "user", None, None, None, None, 6_000, 5),  # delete
    ("c1", 0, "user", "t4", None, ["z"], {"k": 9, "src": "y"}, 7_000, 6),
]


def test_collection_transition_matrix():
    out = derive_ops(_log(ROWS), value_cols=COLLECTION_VALUE_COLS)
    assert out["op"].to_pylist() == ["c", "u", "u", "u", "u", "d", "u"]
    assert out["modified_cols"].to_pylist() == [
        "meta,role,tags,text",  # create: everything appears
        "tags",  # element added, text/meta untouched
        "meta,text",  # struct field changed
        "tags,text",  # emptied: [] != [a,b]
        "tags,text",  # set-to-NULL: NULL != []
        "meta,role,text",  # delete: tags was ALREADY NULL -> NULL==NULL unmodified
        "meta,role,tags,text",  # re-insert from NULL before
    ]
    # before image is the lagged after image, including collection cells
    assert out["before_tags"].to_pylist() == [
        None,
        ["a"],
        ["a", "b"],
        ["a", "b"],
        [],
        None,
        None,
    ]
    assert out["after_tags"].to_pylist()[3] == []  # emptied stays [], not NULL
    assert out["after_tags"].to_pylist()[4] is None
    assert out["before_meta"].to_pylist()[2] == {"k": 1, "src": "x"}
    assert out["after_meta"].to_pylist()[2] == {"k": 2, "src": "x"}
    # delete: after state entirely NULL
    assert out["after_meta"].to_pylist()[5] is None


def test_collections_envelope_roundtrip_and_only_updated():
    cfg = EngineConfig(num_shards=4)
    flat = derive_ops(_log(ROWS), value_cols=COLLECTION_VALUE_COLS)
    env = build_envelope(flat, cfg, value_cols=COLLECTION_VALUE_COLS)
    back = flatten_envelope(env)
    assert back["after_tags"].to_pylist() == flat["after_tags"].to_pylist()
    assert back["before_meta"].to_pylist() == flat["before_meta"].to_pylist()

    # only-updated: untouched collection cells are NULLed in the after image
    cfg_ou = EngineConfig(num_shards=4, include_after=IncludeMode.ONLY_UPDATED)
    env_ou = build_envelope(flat, cfg_ou, value_cols=COLLECTION_VALUE_COLS)
    after = env_ou["after"].combine_chunks()
    tags = pc.struct_field(after, "tags").to_pylist()
    meta = pc.struct_field(after, "meta").to_pylist()
    # row 1 modified only tags -> tags kept, meta dropped
    assert tags[1] == ["a", "b"] and meta[1] is None
    # row 2 modified meta (+text) -> meta kept, tags dropped
    assert meta[2] == {"k": 2, "src": "x"} and tags[2] is None
    # row 3 emptied tags -> [] kept (present-but-empty, not NULL)
    assert tags[3] == []


# --- map (list<struct<key,value>>) value columns — M8 map widening ---------


def _attrs(entries_per_row):
    """entries_per_row: list of None | list[(k, v)]"""
    import numpy as np

    keys, vals = [], []
    offsets = [0]
    mask = []
    for row in entries_per_row:
        if row is None:
            mask.append(True)
            offsets.append(offsets[-1])
            continue
        mask.append(False)
        for k, v in row:
            keys.append(k)
            vals.append(v)
        offsets.append(offsets[-1] + len(row))
    entries = pa.StructArray.from_arrays(
        [pa.array(keys, pa.int64()), pa.array(vals, pa.string())], names=["key", "value"]
    )
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), entries, mask=pa.array(mask)
    )


def test_map_codec_round_trip():
    from scylla_cdc_source_connector_ray.schema import decode_nested, encode_nested

    col = _attrs([None, [], [(0, "a")], [(0, "a"), (7, "high")], []])
    t = pa.table({"x": pa.array([1, 2, 3, 4, 5], pa.int64()), "attrs": col})
    rt = decode_nested(encode_nested(t))
    assert rt["attrs"].combine_chunks().to_pylist() == col.to_pylist()
    assert rt["x"].to_pylist() == t["x"].to_pylist()


def test_map_values_neq_three_states():
    from scylla_cdc_source_connector_ray.stages.op_derive import _values_neq

    a = _attrs([None, [], [(0, "a")], [(0, "a")], None])
    b = _attrs([None, None, [(0, "a")], [(0, "b")], []])
    assert _values_neq(a, b).to_pylist() == [False, True, False, True, True]


def test_list_codec_empty_string_element_injective():
    """[''] and [] must survive the transport round-trip as distinct states
    and register as a modification in the value diff."""
    from scylla_cdc_source_connector_ray.schema import decode_nested, encode_nested
    from scylla_cdc_source_connector_ray.stages.op_derive import _values_neq

    col = pa.array([[""], [], None, ["", ""], ["a", ""]], pa.list_(pa.string()))
    t = pa.table({"tags": col})
    rt = decode_nested(encode_nested(t))
    assert rt["tags"].combine_chunks().to_pylist() == col.to_pylist()
    a = pa.array([[""], [], ["a"]], pa.list_(pa.string()))
    b = pa.array([[], [""], ["a"]], pa.list_(pa.string()))
    assert _values_neq(a, b).to_pylist() == [True, True, False]


def test_empty_struct_equals_null_struct():
    """Empty-UDT → NULL (ScyllaSchema.java:297-430): a struct with no set
    fields compares equal to a NULL struct, distinct from any set field."""
    from scylla_cdc_source_connector_ray.stages.op_derive import _values_neq

    typ = pa.struct([("k", pa.int64()), ("src", pa.string())])
    a = pa.array([{"k": None, "src": None}, None, {"k": 1, "src": None}], typ)
    b = pa.array([None, {"k": None, "src": None}, {"k": None, "src": None}], typ)
    assert _values_neq(a, b).to_pylist() == [False, False, True]


def test_tuple_all_null_is_a_value():
    """Tuple semantics (ScyllaChangeRecordEmitter.java:749-764): an all-NULL
    tuple is DISTINCT from a NULL tuple — unlike a UDT, where empty → NULL."""
    import pyarrow as pa

    from scylla_cdc_source_connector_ray.schema import PAIR_TYPE
    from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops

    pairs = pa.array(
        [None, (None, None), (None, None), (1, "x"), None],
        type=PAIR_TYPE,
    )
    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 5, pa.string()),
            "turn_idx": pa.array([0] * 5, pa.int32()),
            "text": pa.array(["t1", "t2", "t3", "t4", "t5"], pa.string()),
            "pair": pairs,
            "ts": pa.array([1, 2, 3, 4, 5], pa.timestamp("us")),
            "seq": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    out = derive_ops(t, value_cols=("text", "pair", "ts")).to_pandas()
    # NULL → (None,None): modified; (None,None) → (None,None): NOT modified;
    # (None,None) → (1,x): modified; (1,x) → NULL: modified
    assert list(out["modified_cols"]) == [
        "text", "pair,text", "text", "pair,text", "pair,text",
    ]


def test_encode_nested_rejects_separator_chars():
    import pyarrow as pa
    import pytest

    from scylla_cdc_source_connector_ray.schema import encode_nested

    t = pa.table({"tags": pa.array([["ok"], ["bad\x1felement"]], pa.list_(pa.string()))})
    with pytest.raises(ValueError, match="separator"):
        encode_nested(t)
    t2 = pa.table({"tags": pa.array([["fine"], []], pa.list_(pa.string()))})
    encode_nested(t2)  # clean input passes


def test_encode_nested_rejects_separator_in_map_keys():
    import pyarrow as pa
    import pytest

    from scylla_cdc_source_connector_ray.schema import encode_nested

    entry = pa.struct([("key", pa.string()), ("value", pa.string())])
    t = pa.table(
        {"attrs": pa.array([[{"key": "a\x02b", "value": "ok"}]], pa.list_(entry))}
    )
    with pytest.raises(ValueError, match="keys"):
        encode_nested(t)


def test_pair_col_null_value_means_null_pair():
    """NULL `value` must yield pair = NULL (oracle CASE→FALSE semantics),
    never a set pair with floor(NaN) garbage in field_0."""
    import pyarrow as pa

    from scylla_cdc_source_connector_ray.sources.events_adapter import _pair_col

    batch = pa.table(
        {
            "event_type": pa.array(["click", "error", "view"], pa.string()),
            "value": pa.array([None, 2.0, 7.5], pa.float64()),
        }
    )
    got = _pair_col(batch).to_pylist()
    assert got[0] is None  # null value -> null pair
    assert got[1] is None  # error -> null pair
    assert got[2] is None  # 5 <= value < 10 -> null pair
