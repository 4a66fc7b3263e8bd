from .mne_adapter import EpochsWavelet
from .plotting import plot_tf, plot_wavelet

__all__ = ["EpochsWavelet", "plot_tf", "plot_wavelet"]
