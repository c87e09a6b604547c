"""Wire quantization: int16 sweep payload pack/unpack roundtrip."""
import numpy as np
import jax.numpy as jnp

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.models.odometry import WireSweep, unpack_wire
from sr_livo_tpu.runtime import measurements as meas_mod


def _prep(n=500, n_max=1024, duration=0.1, rng=None):
    rng = rng or np.random.RandomState(0)
    cfg = LivoConfig()
    cfg.shapes.max_sweep_points = n_max
    cfg.shapes.max_imu_samples = 8
    pts = np.zeros((n, 4))
    pts[:, :3] = rng.uniform(-80.0, 80.0, (n, 3))
    pts[:, 3] = np.sort(rng.uniform(0.0, duration, n))
    meas = meas_mod.Measurement(
        time_image=duration, time_sweep_begin=0.0, duration=duration,
        rendering=False,
        imu=[(duration, np.zeros(3), np.zeros(3))], points=pts)
    return meas_mod.prepare_sweep(meas, 0.0, cfg), duration


def test_pack_roundtrip_accuracy():
    prep, duration = _prep()
    wire = meas_mod.pack_sweep(prep, duration)
    imu_pack = np.concatenate([
        prep.imu_t[:, None], prep.imu_dt[:, None], prep.imu_acc,
        prep.imu_gyr, prep.imu_valid[:, None].astype(np.float32)],
        axis=1).astype(np.float32)
    meta = np.array([wire.scale, wire.duration, 1.0, 1.0], np.float32)
    sw = unpack_wire(WireSweep(
        pts_q=jnp.asarray(wire.pts_q), imu=jnp.asarray(imu_pack),
        meta=jnp.asarray(meta)))
    assert bool(sw.do_optimize) and int(sw.threshold_capacity) == 1
    assert np.allclose(np.asarray(sw.imu_t), prep.imu_t)
    assert np.allclose(np.asarray(sw.imu_acc), prep.imu_acc, atol=1e-6)
    assert np.array_equal(np.asarray(sw.imu_valid), prep.imu_valid)
    raw = np.asarray(sw.raw_pts)
    t_rel = np.asarray(sw.t_rel)
    valid = np.asarray(sw.pt_valid)
    n = prep.n_points
    assert valid[:n].all() and not valid[n:].any()
    # xyz quanta: 80 m range / 32000 = 2.5 mm -> max error 1.25 mm + f32
    assert np.abs(raw[:n] - prep.raw_pts[:n]).max() < 2.0e-3
    # time quanta: 0.1 s / 32000 ~ 3.1 us
    assert np.abs(t_rel[:n] - prep.t_rel[:n]).max() < 5e-6
    # padding unpacks to zeros
    assert np.all(raw[n:] == 0.0) or np.all(~valid[n:])


def test_pack_empty_and_full():
    rng = np.random.RandomState(1)
    prep, duration = _prep(n=1024, n_max=1024, rng=rng)
    wire = meas_mod.pack_sweep(prep, duration)
    assert (wire.pts_q[:, 3] >= 0).all()
    assert wire.scale > 0
