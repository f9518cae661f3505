import numpy as np
import jax.numpy as jnp

from strolle_tpu.ops import rng


def _pcg_ref(state: int) -> tuple[int, int]:
    """Reference PCG-hash (white.rs:35-42) in plain Python uint32."""
    M = 0xFFFFFFFF
    state = (state * 747796405 + 2891336453) & M
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & M
    return state, ((word >> 22) ^ word) & M


def test_pcg_bit_exact():
    seeds = np.asarray([0, 1, 12345, 0xDEADBEEF & 0x7FFFFFFF, 999999], np.uint32)
    state = jnp.asarray(seeds)
    for _ in range(5):
        state, word = rng.next_u32(state)
        for i, s in enumerate(seeds):
            s2, w = _pcg_ref(int(s))
            assert int(state[i]) == s2
            assert int(word[i]) == w
        seeds = np.asarray([int(x) for x in state], np.uint64).astype(np.uint32)


def test_seed_mixing():
    s = rng.wnoise_new(7, jnp.asarray([1, 2], jnp.uint32), jnp.asarray([3, 4], jnp.uint32))
    expected0 = 7 ^ (48619 * 1) ^ (95461 * 3)
    expected1 = (7 ^ ((48619 * 2) & 0xFFFFFFFF) ^ ((95461 * 4) & 0xFFFFFFFF)) & 0xFFFFFFFF
    assert int(s[0]) == expected0 & 0xFFFFFFFF
    assert int(s[1]) == expected1


def test_uniform_range():
    state = rng.wnoise_new(3, jnp.arange(1000, dtype=jnp.uint32), jnp.uint32(0))
    vals = []
    for _ in range(8):
        state, u = rng.next_f32(state)
        vals.append(np.asarray(u))
    v = np.concatenate(vals)
    assert (v >= 0).all() and (v <= 1).all()
    assert abs(v.mean() - 0.5) < 0.02


def test_sphere_hemisphere_shapes():
    state = rng.wnoise_new(1, jnp.arange(64, dtype=jnp.uint32), jnp.uint32(2))
    state, s = rng.sample_sphere(state)
    assert s.shape == (64, 3)
    assert (np.linalg.norm(np.asarray(s), axis=-1) <= 1.0 + 1e-5).all()

    n = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (64, 1))
    state, h = rng.sample_hemisphere(state, n)
    h = np.asarray(h)
    assert np.allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-5)
    assert (h[:, 1] >= -1e-6).all()  # in hemisphere around +y


def test_replay_determinism():
    """Stored state replays the exact same stream (GI validation contract)."""
    state0 = rng.wnoise_new(42, jnp.uint32(5), jnp.uint32(9))
    s, a = rng.next_f32(state0)
    s, b = rng.next_f32(s)
    s2, a2 = rng.next_f32(state0)
    s2, b2 = rng.next_f32(s2)
    assert float(a) == float(a2) and float(b) == float(b2)
