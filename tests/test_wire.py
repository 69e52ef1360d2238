"""Compact wire-format roundtrip parity (data/wire.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thermal_semantic_segmentation_tpu.data.device_pipeline import device_prefetch
from thermal_semantic_segmentation_tpu.data.wire import (
    PackedFeed, pack_batch, unpack_batch)


def _batch(b=4):
    rng = np.random.default_rng(0)
    return {
        "image": rng.uniform(0, 1, (b, 16, 24, 1)).astype(np.float32),
        "label": rng.integers(0, 13, (b, 16, 24)).astype(np.int64),
        "weak_params": {
            "resized_hw": rng.integers(256, 1400, (b, 2)).astype(np.int64),
            "crop": rng.integers(-4, 4000, (b, 4)).astype(np.int64),
            "flip": rng.integers(0, 2, (b,)).astype(bool),
        },
        "path": [f"img_{i}.png" for i in range(b)],
    }


def test_pack_unpack_roundtrip():
    batch = _batch()
    host, packed, spec = pack_batch(batch)
    assert packed.dtype == np.uint8 and packed.shape[0] == 4
    out = unpack_batch(jnp.asarray(packed), host, spec)
    assert out["path"] == batch["path"]
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    np.testing.assert_array_equal(np.asarray(out["label"]), batch["label"])
    assert out["label"].dtype == jnp.int32
    for k in batch["weak_params"]:
        np.testing.assert_array_equal(
            np.asarray(out["weak_params"][k]), batch["weak_params"][k])
    assert out["weak_params"]["flip"].dtype == jnp.bool_


def test_wire_narrows_losslessly():
    batch = _batch()
    _, packed, _ = pack_batch(batch)
    dense = (batch["image"].nbytes + 4 * batch["label"].size)
    assert packed.shape[0] * packed.shape[1] < 0.7 * dense  # u8 labels


def test_bf16_float_wire():
    batch = _batch()
    host, packed, spec = pack_batch(batch, float_wire="bfloat16")
    out = unpack_batch(jnp.asarray(packed), host, spec)
    assert out["image"].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out["image"]),
        batch["image"].astype(jnp.bfloat16).astype(np.float32))


def test_packed_feed_matches_plain_prefetch():
    batches = [_batch(), _batch()]
    plain = list(device_prefetch(iter(batches)))
    packed = list(device_prefetch(iter(batches), wire="packed"))
    assert len(plain) == len(packed) == 2
    for p, q in zip(plain, packed):
        np.testing.assert_array_equal(np.asarray(p["image"]),
                                      np.asarray(q["image"]))
        np.testing.assert_array_equal(np.asarray(p["label"]),
                                      np.asarray(q["label"]))
        assert p["path"] == q["path"]


def test_packed_feed_sharded_equals_unsharded():
    from thermal_semantic_segmentation_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    if mesh.size == 1:
        pytest.skip("needs multi-device mesh")
    batch = _batch(b=8)
    feed = PackedFeed(mesh)
    out = feed.put(batch)
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    np.testing.assert_array_equal(np.asarray(out["label"]), batch["label"])
    # leading dim sharded over the data axis
    shard_shapes = {s.data.shape for s in out["image"].addressable_shards}
    assert all(s[0] == 8 // mesh.shape["data"] or s[0] == 8 // mesh.size
               for s in shard_shapes)


def test_device_arrays_pass_through_unpacked():
    batch = {"host_meta": jnp.arange(4), "image": _batch()["image"]}
    feed = PackedFeed()
    out = feed.put(batch)
    assert out["host_meta"] is batch["host_meta"]  # no host roundtrip
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])


def test_resolve_wire_guards_lossy_bf16():
    import argparse
    from thermal_semantic_segmentation_tpu.cli._common import resolve_wire
    ns = argparse.Namespace(wire="packed_bf16", bf16=False)
    assert resolve_wire(ns) == "packed"            # f32 compute: downgraded
    ns.bf16 = True
    assert resolve_wire(ns) == "packed_bf16"       # bf16 compute: allowed
    assert resolve_wire(ns, bf16_compute=False) == "packed"  # explicit override
    assert resolve_wire(argparse.Namespace(wire="none")) is None


def test_randomized_roundtrip_many_dtypes():
    """Fuzz the pack/unpack roundtrip across dtypes, shapes, and values
    (incl. int16/int32 boundaries, negatives, empty tail dims)."""
    rng = np.random.default_rng(42)
    dtypes = [np.float32, np.float64, np.int64, np.int32, np.int16, np.uint8,
              np.bool_]
    for trial in range(20):
        b = int(rng.integers(1, 5))
        batch = {}
        for k in range(int(rng.integers(1, 5))):
            dt = dtypes[int(rng.integers(len(dtypes)))]
            shape = (b, *rng.integers(1, 7, size=int(rng.integers(0, 3))))
            if dt == np.bool_:
                arr = rng.integers(0, 2, shape).astype(bool)
            elif np.issubdtype(dt, np.integer):
                info = np.iinfo(np.int32)
                arr = rng.integers(info.min, info.max, shape).astype(dt)
            else:
                arr = (rng.standard_normal(shape) * 1e3).astype(dt)
            batch[f"k{k}"] = arr
        host, packed, spec = pack_batch(batch)
        out = unpack_batch(jnp.asarray(packed), host, spec)
        for k, arr in batch.items():
            want = arr
            if np.issubdtype(arr.dtype, np.integer):
                want = arr.astype(np.int32)  # x64-disabled jax semantics
            elif arr.dtype == np.float64:
                want = arr.astype(np.float32)
            np.testing.assert_array_equal(np.asarray(out[k]), want,
                                          err_msg=f"trial {trial} key {k} "
                                                  f"dtype {arr.dtype}")


def test_width_memo_pins_spec_across_straddling_batches():
    """A batch whose int values straddle a width boundary must not flip the
    spec back and forth (each flip = one jitted-unpack retrace). With a
    width_memo (as PackedFeed threads), the width only ever widens."""
    small = {"v": np.arange(4 * 3, dtype=np.int64).reshape(4, 3)}       # u8
    big = {"v": (np.arange(4 * 3, dtype=np.int64) + 300).reshape(4, 3)}  # i16

    # bare pack_batch: specs legitimately differ
    spec_small = pack_batch(small)[2]
    spec_big = pack_batch(big)[2]
    assert spec_small != spec_big

    memo = {}
    s1 = pack_batch(small, width_memo=memo)[2]
    s2 = pack_batch(big, width_memo=memo)[2]
    s3 = pack_batch(small, width_memo=memo)[2]  # pinned: stays at i16
    assert s2 == s3
    assert s1 != s2  # one widening is allowed...
    for batch in (small, big, small):
        host, packed, spec = pack_batch(batch, width_memo=memo)
        out = unpack_batch(jnp.asarray(packed), host, spec)
        np.testing.assert_array_equal(np.asarray(out["v"]), batch["v"])
