import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.models.ar_decoder import STEVETransformerDecoder

pytestmark = pytest.mark.fast

V, D, S, L = 16, 32, 3, 15  # vocab, d_model, slots, max_len (tokens-1)


@pytest.fixture(scope="module")
def decoder_and_vars():
    dec = STEVETransformerDecoder(
        vocab_size=V, d_model=D, n_head=2, max_len=L, num_slots=S,
        num_layers=2)
    slots = jax.random.normal(jax.random.PRNGKey(0), (2, S, D))
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, L), 0, V)
    variables = dec.init(jax.random.PRNGKey(2), slots, idx)
    return dec, variables, slots, idx


def test_teacher_forcing_shapes(decoder_and_vars):
    dec, variables, slots, idx = decoder_and_vars
    logits = dec.apply(variables, slots, idx)
    assert logits.shape == (2, L + 1, V)


def test_causality(decoder_and_vars):
    """Changing a later input token must not affect earlier logits."""
    dec, variables, slots, idx = decoder_and_vars
    logits1 = dec.apply(variables, slots, idx)
    idx2 = idx.at[:, 10].set((idx[:, 10] + 1) % V)
    logits2 = dec.apply(variables, slots, idx2)
    # positions 0..10 attend only to tokens before them (BOS + idx[:, :10])
    np.testing.assert_allclose(
        np.asarray(logits1[:, :11]), np.asarray(logits2[:, :11]),
        atol=1e-5)
    assert np.abs(np.asarray(logits1[:, 11:]) -
                  np.asarray(logits2[:, 11:])).max() > 1e-6


def test_generate_matches_teacher_forcing(decoder_and_vars):
    """Greedy KV-cached generation must equal iterative full forwards."""
    dec, variables, slots, idx = decoder_and_vars
    steps = 6
    ids, logits = dec.apply(variables, slots, steps, method=dec.generate)
    assert ids.shape == (2, steps)
    assert logits.shape == (2, steps, V)

    # reference loop: re-run full teacher-forced forward per step
    cur = jnp.zeros((2, 0), jnp.int32)
    ref_ids = []
    for t in range(steps):
        lg = dec.apply(variables, slots, cur)
        nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        ref_ids.append(nxt)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    ref_ids = jnp.stack(ref_ids, axis=1)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_generate_sampling_runs(decoder_and_vars):
    dec, variables, slots, idx = decoder_and_vars
    ids, _ = dec.apply(variables, slots, 4, True, 1.0,
                       jax.random.PRNGKey(5), method=dec.generate)
    assert ids.shape == (2, 4)
    assert int(ids.max()) < V
