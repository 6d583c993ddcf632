"""Regenerate docs/assets/demo_enhanced_multires.png (the README hero
image — the rebuild's analog of the reference's assets/spectrogram.png).

The scene is chosen to show each analysis feature at once: harmonic bass
stacks (multires low-end resolution), a slow bass glide, a vibrato
melody (frequency reassignment tracks the FM as a thread-thin ridge),
noise bursts (time reassignment sharpens transients into verticals),
and an airy noise sheen (the gate/AGC keep it a texture, not a wash).

Run from the repo root: python docs/assets/make_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from emspec.config import Settings  # noqa: E402
from emspec.pipeline import render_image_multires  # noqa: E402
from emspec.render.png import write_png  # noqa: E402

sr = 48000
dur = 6.0
n = int(sr * dur)
t = np.arange(n) / sr
rng = np.random.default_rng(0)
x = np.zeros_like(t, dtype=np.float64)
# harmonic stacks (bass chords) — exercises the multires low end
for i, f0 in enumerate([55.0, 73.4, 98.0, 110.0]):
    seg = (t >= i * 1.4) & (t < i * 1.4 + 2.2)
    for h in range(1, 10):
        x += np.where(seg, (0.22 / h) * np.sin(2 * np.pi * f0 * h * t + 0.1 * h), 0.0)
# slow bass glide
x += 0.3 * np.sin(2 * np.pi * (30.0 * t + 6.0 * t * t))
# vibrato melody in the mids (reassignment tracks the FM cleanly)
f_mel = 1200.0 * 2 ** (np.sin(2 * np.pi * 0.4 * t))
x += 0.22 * np.sin(2 * np.pi * np.cumsum(f_mel) / sr
                   + 4.0 * np.sin(2 * np.pi * 6.0 * t))
# airy high sheen + percussive noise bursts
x += 0.02 * rng.standard_normal(n) * (1 + np.sin(2 * np.pi * 0.25 * t))
for tb in (0.7, 2.1, 3.5, 4.9):
    burst = np.exp(-((t - tb) * 60) ** 2)
    x += 0.5 * burst * rng.standard_normal(n)
x = (x / np.abs(x).max() * 0.9).astype(np.float32)

s = Settings(mode="enhanced", multires=True, raster_height=512, gain=5.0)
img = render_image_multires(x, s)
write_png("docs/assets/demo_enhanced_multires.png", img)
print("wrote docs/assets/demo_enhanced_multires.png", img.shape)

# side-by-side argument for reassignment: the same scene and settings,
# natural (plain STFT) on top, enhanced (reassigned) below — the
# rebuild's analog of the reference's before/after pitch (README.md:11
# "sharper spectral detail")
nat = render_image_multires(x, Settings(mode="natural", multires=True,
                                        raster_height=512, gain=5.0))
div = np.full((6, img.shape[1], 4), (40, 40, 40, 255), np.uint8)
pair = np.concatenate([np.asarray(nat), div, np.asarray(img)], axis=0)
write_png("docs/assets/demo_natural_vs_enhanced.png", pair)
print("wrote docs/assets/demo_natural_vs_enhanced.png", pair.shape)
