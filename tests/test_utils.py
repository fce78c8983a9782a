"""Checkpoint/resume + profiling utilities."""

import numpy as np
import jax.numpy as jnp

from bbcat_dsp_tpu.convolve import BlockConvolver
from bbcat_dsp_tpu.utils import Timer, load_state, save_state


def test_checkpoint_resume_convolver(tmp_path, rng):
    """Saving mid-stream and resuming in a NEW convolver continues the
    stream bit-exactly (SURVEY.md §5 checkpoint)."""
    B, N, T = 64, 256, 64 * 8
    ir = rng.standard_normal(N) * 0.3
    x = rng.standard_normal((1, T)).astype(np.float32)

    ref = BlockConvolver(ir, block=B)
    y_ref = [np.asarray(ref.process_block(jnp.asarray(x[:, i*B:(i+1)*B])))
             for i in range(8)]

    a = BlockConvolver(ir, block=B)
    for i in range(4):
        a.process_block(jnp.asarray(x[:, i*B:(i+1)*B]))
    p = str(tmp_path / "conv.ckpt")
    save_state(p, a.state)

    b = BlockConvolver(ir, block=B)
    b.state = load_state(p, like=b.state)
    for i in range(4, 8):
        y = np.asarray(b.process_block(jnp.asarray(x[:, i*B:(i+1)*B])))
        np.testing.assert_array_equal(y, y_ref[i])


def test_timer():
    t = Timer()
    out, per = t.time(lambda v: v * 2, jnp.ones(16), iters=3)
    assert per >= 0.0 and np.asarray(out).shape == (16,)
