"""Dataclass configs mirroring the reference's constructor-kwarg surface.

The reference's only configuration mechanism is constructor kwargs
(``/root/reference/ninwavelets/wavelets.py:38-40, 110-113``); SURVEY §5
commits this build to dataclass configs with the same names and defaults
(``sfreq=1000, b=17.5, r=3, sigma=7, interpolate=False``), plus the engine
knobs the TPU build adds (kernel precision, mesh axes, streaming windows).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class MorseConfig:
    """Generalized Morse parameters (reference defaults,
    ``wavelets.py:38``)."""
    sfreq: float = 1000.0
    b: float = 17.5          # beta
    r: float = 3.0           # gamma
    real_wave_length: float = 1.0
    interpolate: bool = False

    def build(self):
        from .models import Morse
        return Morse(self.sfreq, self.b, self.r, self.real_wave_length,
                     self.interpolate)


@dataclass(frozen=True)
class MorletConfig:
    """Morlet/Gabor parameters (reference defaults,
    ``wavelets.py:110-113``)."""
    sfreq: float = 1000.0
    sigma: float = 7.0
    real_wave_length: float = 1.0
    gabor: bool = False
    interpolate: bool = False

    def build(self):
        from .models import Morlet
        return Morlet(self.sfreq, self.sigma, self.real_wave_length,
                      self.gabor, self.interpolate)


@dataclass(frozen=True)
class EngineConfig:
    """TPU engine knobs (no reference counterpart — the reference's only
    engine switch is the ``cuda`` flag this build ignores)."""
    precision: str = "fast3"       # fused-kernel matmul precision
    use_fused: bool = True         # allow the Pallas kernel where it fits
    mesh_shape: Tuple[int, int, int] = (1, 1, 1)   # (data, freq, time)
    streaming_window: int = 65536  # StreamingCWT window, samples
    halo_tol: float = 1e-4         # halo sizing envelope tolerance


@dataclass(frozen=True)
class PipelineConfig:
    """A full analysis pipeline: wavelet + engine + baseline window."""
    wavelet: MorseConfig = field(default_factory=MorseConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    baseline: Optional[Tuple[float, float]] = None   # (start_s, stop_s)
    baseline_method: str = "zscore"


def run_pipeline(cfg: PipelineConfig, epochs) -> dict:
    """Execute a configured analysis pipeline over an MNE-style epochs
    container: build the wavelet, compute the all-channel epoch-mean power
    TFR (fused kernel where eligible), optionally baseline-correct it, and
    return the results.

    Returns a dict with ``power`` (C, F, N) and ``itc`` (C, F, N) device
    arrays (baseline correction applied to ``power`` when configured).
    """
    import numpy as np

    from .ops.baseline import baseline_tf
    from .utils.mne_adapter import EpochsWavelet

    wavelet = cfg.wavelet.build()
    ew = EpochsWavelet(epochs, wavelet)
    sfreq = wavelet.sfreq
    freqs = np.arange(1.0, 101.0)
    power = ew.power_all(freqs)
    itc = ew.itc_all(freqs)
    if cfg.baseline is not None:
        start, stop = cfg.baseline
        power = baseline_tf(power, sfreq, start, stop, cfg.baseline_method)
    return {"power": power, "itc": itc, "freqs": freqs, "wavelet": wavelet}
