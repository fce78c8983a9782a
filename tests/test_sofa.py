"""SOFA round-trip + integration with the binaural renderer."""

import numpy as np
import jax.numpy as jnp

from bbcat_dsp_tpu.sofa import SOFAFile, write_sofa
from bbcat_dsp_tpu.models import BinauralRenderer
from bbcat_dsp_tpu import golden
from conftest import snr_db


def _make_sofa(tmp_path, rng, M=12, R=2, N=128):
    ir = rng.standard_normal((M, R, N)) * np.exp(-np.arange(N) / 30.0)
    az = np.linspace(0, 330, M)
    pos = np.stack([az, np.zeros(M), np.full(M, 1.2)], -1)
    p = str(tmp_path / "test.sofa")
    write_sofa(p, ir, 48000.0, pos)
    return p, ir, pos


def test_roundtrip(tmp_path, rng):
    p, ir, pos = _make_sofa(tmp_path, rng)
    s = SOFAFile.open(p)
    assert s.convention == "SimpleFreeFieldHRIR"
    assert (s.n_measurements, s.n_receivers, s.n_samples) == ir.shape
    assert s.fs == 48000.0
    np.testing.assert_allclose(s.ir, ir)
    np.testing.assert_allclose(s.source_positions, pos)


def test_nearest_lookup(tmp_path, rng):
    p, ir, pos = _make_sofa(tmp_path, rng)
    s = SOFAFile.open(p)
    assert s.nearest(62.0, 0.0) == 2   # az grid is 0,30,60,...
    assert s.nearest(359.0) == 0
    np.testing.assert_allclose(s.impulse_response(2), ir[2])


def test_netcdf3_reader(tmp_path, rng):
    """Classic netCDF-3 SOFA files load through the scipy backend."""
    from scipy.io import netcdf_file

    ir = rng.standard_normal((4, 2, 64))
    p = str(tmp_path / "classic.sofa")
    with netcdf_file(p, "w") as f:
        f.createDimension("M", 4)
        f.createDimension("R", 2)
        f.createDimension("N", 64)
        f.createDimension("I", 1)
        f.createDimension("C", 3)
        v = f.createVariable("Data.IR", "d", ("M", "R", "N"))
        v[:] = ir
        sr = f.createVariable("Data.SamplingRate", "d", ("I",))
        sr[:] = [44100.0]
        sp = f.createVariable("SourcePosition", "d", ("M", "C"))
        sp[:] = np.zeros((4, 3))
        f.SOFAConventions = "SimpleFreeFieldHRIR"
    s = SOFAFile.open(p)
    assert s.fs == 44100.0
    np.testing.assert_allclose(s.ir, ir)


def test_sofa_to_binaural_renderer(tmp_path, rng):
    """SOFA -> hrtf_matrix -> MatrixConvolver end-to-end."""
    p, ir, pos = _make_sofa(tmp_path, rng, M=8, R=2, N=64)
    s = SOFAFile.open(p)
    dirs = [(0.0, 0.0), (90.0, 0.0), (180.0, 0.0)]
    hm = s.hrtf_matrix(dirs)
    assert hm.shape == (3, 2, 64)
    B, T = 64, 64 * 4
    r = BinauralRenderer(hm, block=B)
    x = rng.standard_normal((3, T)).astype(np.float32)
    outs = [np.asarray(r.process_block(jnp.asarray(x[:, i*B:(i+1)*B])))
            for i in range(T // B)]
    y = np.concatenate(outs, -1)
    for o in range(2):
        ref = np.zeros(T)
        for i in range(3):
            ref += golden.direct_convolve(x[i], hm[i, o])[:T]
        assert snr_db(ref, y[o]) > 90.0
