"""Checkpoint / resume: the streaming carry is a plain pytree, so it is
serializable with pickle and orbax and a resumed stream must continue
bit-identically (the reference's nearest analog is its trivially copyable
state struct, savgol_stream.h:29-37 — here it is a first-class feature)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

import savgol_tpu as sg
from savgol_tpu import stream as fs

F64 = jnp.float64


def run_stream(filter_, state, samples):
    outs = []
    for v in samples:
        state, o, c = fs.stream_push_full(
            state, v, filter_.center_weights, filter_.edge_weights,
            filter_.dt_inv)
        outs.extend(np.asarray(o)[:int(c)].tolist())
    return state, outs


class TestPickleResume:
    def test_stream_resumes_identically(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(60)
        f = sg.Savgol1D.create(sg.SavgolConfig(5, 3), dtype=F64)

        # uninterrupted run
        st = fs.stream_init(5, dtype=F64)
        _, full = run_stream(f, st, x)

        # run half, checkpoint, restore, run rest
        st = fs.stream_init(5, dtype=F64)
        st, first = run_stream(f, st, x[:30])
        blob = pickle.dumps(jax.device_get(st))
        restored = jax.tree_util.tree_map(jnp.asarray,
                                          pickle.loads(blob))
        restored = fs.StreamState(*restored)
        _, second = run_stream(f, restored, x[30:])
        np.testing.assert_array_equal(np.array(first + second),
                                      np.array(full))

    def test_counters_survive(self):
        f = sg.Savgol1D.create(sg.SavgolConfig(4, 2), dtype=F64)
        st = fs.stream_init(4, dtype=F64)
        st, _ = run_stream(f, st, np.arange(20.0))
        rt = fs.StreamState(*jax.tree_util.tree_map(
            jnp.asarray, pickle.loads(pickle.dumps(jax.device_get(st)))))
        assert int(rt.samples_received) == 20
        assert int(rt.samples_output) == int(st.samples_output)


class TestOrbaxResume:
    def test_orbax_roundtrip(self, tmp_path):
        ocp = __import__("pytest").importorskip("orbax.checkpoint")
        f = sg.Savgol1D.create(sg.SavgolConfig(6, 3), dtype=F64)
        st = fs.stream_init(6, dtype=F64)
        st, _ = run_stream(f, st, np.arange(30.0))
        path = tmp_path / "ckpt"
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(str(path), jax.device_get(st))
        restored_raw = ckptr.restore(str(path))
        # orbax restores namedtuples as field dicts — rebuild by name
        if isinstance(restored_raw, dict):
            restored = fs.StreamState(**{k: jnp.asarray(v)
                                         for k, v in restored_raw.items()})
        else:
            restored = fs.StreamState(
                *[jnp.asarray(v) for v in restored_raw])
        np.testing.assert_array_equal(np.asarray(restored.buffer),
                                      np.asarray(st.buffer))
        # resumed stream continues identically
        st2, a = run_stream(f, st, np.arange(30.0, 40.0))
        _, b = run_stream(f, restored, np.arange(30.0, 40.0))
        np.testing.assert_array_equal(np.array(a), np.array(b))


class TestFilterSerialization:
    def test_filter_object_roundtrip(self):
        """Savgol1D is a pytree of arrays + static config: device_get +
        pickle round-trips exactly."""
        f = sg.Savgol1D.create(sg.SavgolConfig(12, 4, 2, 0.5), dtype=F64)
        leaves, treedef = jax.tree_util.tree_flatten(f)
        blob = pickle.dumps((jax.device_get(leaves), treedef))
        leaves2, treedef2 = pickle.loads(blob)
        g = jax.tree_util.tree_unflatten(treedef2, leaves2)
        assert g.config == f.config
        np.testing.assert_array_equal(np.asarray(g.center_weights),
                                      np.asarray(f.center_weights))
        x = jnp.asarray(np.arange(50.0), dtype=F64)
        np.testing.assert_array_equal(np.asarray(g.apply(x)),
                                      np.asarray(f.apply(x)))


class TestChunkedResume:
    def test_chunked_state_resumes_identically(self):
        """ChunkState checkpoints mid-stream and resumes bit-identically
        (same pytree story as StreamState: the carry IS the checkpoint)."""
        rng = np.random.default_rng(7)
        data = rng.standard_normal((6, 256)).astype(np.float32)
        f = sg.Savgol1D.create(sg.SavgolConfig(6, 3), dtype=jnp.float32)

        def run(st, chunks):
            outs = []
            for ch in chunks:
                st, o, c = fs.stream_process_chunk(
                    st, jnp.asarray(ch), f.center_weights,
                    f.edge_weights, f.dt_inv)
                outs.append(np.asarray(o)[:int(c)])
            return st, np.concatenate(outs)

        # uninterrupted
        _, full = run(fs.chunk_init(6, jnp.float32), data)

        # checkpoint after 3 chunks, pickle, restore, finish
        st, first = run(fs.chunk_init(6, jnp.float32), data[:3])
        blob = pickle.dumps(jax.device_get(st))
        restored = fs.ChunkState(*jax.tree_util.tree_map(
            jnp.asarray, pickle.loads(blob)))
        _, second = run(restored, data[3:])
        np.testing.assert_array_equal(np.concatenate([first, second]),
                                      full)
