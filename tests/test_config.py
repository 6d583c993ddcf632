"""Settings-surface tests: defaults match the reference panel
(assets/settings.png), preset CRUD round-trips, structural split."""

import json

import pytest

from emspec.config import (
    FFT_SIZES, PresetStore, Settings, is_structural_change,
)


def test_defaults_match_reference_panel():
    s = Settings()
    assert s.fft_size == 4096          # settings.png dropdown
    assert s.colormap == "inferno"
    assert s.brightness == pytest.approx(0.44)
    assert s.db_range == 58.0
    assert s.gain == 3.5
    assert s.freq_scale == 1.0
    assert s.low_end_boost == 3.9
    assert s.noise_gate_db == -65.0
    assert s.agc_strength == 1.0
    assert s.smoothing == 0.0
    assert s.scroll_speed == 1.0
    assert s.mode == "enhanced"
    assert s.auto_gain is True


def test_fft_size_envelope():
    # north-star 512–32768 + §5.7 scaling extensions 65536/131072/262144
    assert FFT_SIZES == (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536,
                         131072, 262144)
    with pytest.raises(ValueError):
        Settings(fft_size=1000)


def test_validation():
    with pytest.raises(ValueError):
        Settings(mode="turbo")
    with pytest.raises(ValueError):
        Settings(colormap="rainbow")
    with pytest.raises(ValueError):
        Settings(smoothing=1.0)
    # multires bank sizes must be powers of two >= 256 (kernel tile
    # policies and the fourstep factorization assume it)
    with pytest.raises(ValueError):
        Settings(multires_sizes=(8192, 2048, 768))
    with pytest.raises(ValueError):
        Settings(multires_sizes=(128,))


def test_structural_vs_continuous_split():
    s = Settings()
    assert is_structural_change(s, s.replace(fft_size=8192))
    assert is_structural_change(s, s.replace(mode="natural"))
    assert not is_structural_change(s, s.replace(gain=7.0))
    assert not is_structural_change(s, s.replace(colormap="viridis"))
    assert not is_structural_change(s, s.replace(smoothing=0.5, db_range=80.0))


def test_hop_auto():
    assert Settings(multires=False, fft_size=2048).hop_samples == 512
    assert Settings(multires=True).hop_samples == 128  # smallest bank 512 // 4
    assert Settings(hop=100).hop_samples == 100


def test_roundtrip_dict():
    s = Settings(gain=9.0, multires_sizes=(4096, 1024, 512))
    assert Settings.from_dict(json.loads(json.dumps(s.to_dict()))) == s


def test_preset_store_crud(tmp_path):
    p = tmp_path / "presets.json"
    store = PresetStore(p)
    assert store.names() == ["Default"]
    store.add("Bass", Settings(low_end_boost=8.0))
    store2 = PresetStore(p)  # reload from disk
    assert store2.get("Bass").low_end_boost == 8.0
    store2.delete("Bass")
    assert PresetStore(p).names() == ["Default"]
    with pytest.raises(ValueError):
        store2.delete("Default")


def test_preset_store_corrupt_falls_back(tmp_path):
    p = tmp_path / "presets.json"
    p.write_text("{not json")
    store = PresetStore(p)  # must not raise (SURVEY.md §5.3)
    assert store.names() == ["Default"]


def test_reassign_floor_db_is_wired():
    """The documented knob must actually gate deposits (it was once dead)."""
    import numpy as np
    from emspec.pipeline import Pipeline
    from emspec.io import synth
    s = Settings(mode="enhanced", multires=False, fft_size=1024, hop=256,
                 raster_height=128, auto_gain=False)
    x = synth.tone(440.0, 0.1, 48_000, amplitude=0.1)
    lo = Pipeline(s)                                      # floor -120 dB
    p_lo = np.asarray(lo.process(x)[0])
    # same compiled step, different continuous param: floor ABOVE the
    # tone's |X_h|^2 (~655 here) kills every deposit
    params_hi = lo.params(s.replace(reassign_floor_db=40.0))
    import jax
    from emspec.post.chain import PostState
    vis, _, _ = lo._batch_jit(jax.numpy.asarray(x), params_hi,
                              PostState.init((lo.rows,)),
                              lo.num_columns(len(x)))
    assert p_lo.max() > 0
    assert float(np.asarray(vis).max()) == 0.0            # everything dropped


def test_hostile_values_rejected_at_the_settings_boundary():
    """Every float knob rejects non-numbers, NaN/inf, and f64-finite
    values past the float32 range (the params pytree is f32 on device);
    structural ints reject zero/negative/float.  These must fail at
    ``replace()`` with ValueError — before any pipeline state mutates —
    so the web shell's /api/settings turns them into clean 400s (found
    by a hostile-settings barrage against the live endpoint)."""
    hostile = [
        {"gain": "x"}, {"gain": None}, {"gain": [1, 2]},
        {"gain": float("nan")}, {"db_range": float("inf")},
        {"db_range": 1e308},            # f64-finite, f32-inf
        {"db_range": -3}, {"db_range": 0},
        {"brightness": "bright"}, {"low_end_boost": float("-inf")},
        {"agc_strength": 1e308}, {"scroll_speed": 0},
        {"freq_scale": -5.0}, {"freq_scale": 0.0}, {"freq_scale": 1e300},
        {"raster_height": 0}, {"raster_height": -3},
        {"raster_height": 3.5}, {"raster_width": 0},
        {"hop": -1}, {"sample_rate": 0},
        {"freq_min": 0.0}, {"crossover_low": -1.0},
    ]
    base = Settings()
    for kw in hostile:
        with pytest.raises(ValueError):
            base.replace(**kw)
    # the healthy envelope is untouched
    base.replace(gain=7.5, freq_scale=0.02, db_range=120.0,
                 raster_height=2, hop=0, scroll_speed=0.25)


def test_numpy_scalar_settings_accepted():
    """Library callers legitimately hand numpy scalars to replace();
    the boundary validation must accept them (np.float32/np.int64 do
    not subclass Python float/int) while still rejecting non-finite
    numpy values."""
    import numpy as np

    s = Settings().replace(gain=np.float32(4.5),
                           raster_height=np.int64(128),
                           freq_scale=np.float64(1.5))
    assert s.gain == np.float32(4.5)
    with pytest.raises(ValueError):
        Settings(gain=np.float32("nan"))
    with pytest.raises(ValueError):
        Settings(raster_height=np.int64(0))
