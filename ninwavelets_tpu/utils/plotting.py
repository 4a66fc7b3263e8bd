"""Host-side plotting helpers (reference ``base.py:445-520``).

Pure matplotlib; arrays are pulled to host with ``np.asarray``.  matplotlib
is imported lazily so headless / minimal installs can use the compute path
without it.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

Floats = Union[None, Tuple[float, float], Tuple[float, float, float]]


def plot_wavelet(wavelet_obj, freq: float, show: bool = True):
    """Render one wavelet: time trace plus a 3-D real/imag scatter, and the
    object's ``help`` caution text when present (reference
    ``base.py:449-489``).
    """
    import matplotlib.pyplot as plt

    wavelet = np.asarray(wavelet_obj.make_wavelets(np.array([freq]))[0])
    plt_num = 3 if wavelet_obj.help else 2
    fig = plt.figure(figsize=(6, 8))
    ax = fig.add_subplot(plt_num, 1, 1)
    idx = np.arange(wavelet.shape[0])
    ax.plot(idx, wavelet.real, label='real')
    if np.iscomplexobj(wavelet):
        ax.plot(idx, wavelet.imag, label='imag')
    ax.set_title(type(wavelet_obj).__name__ + ' wavelet')
    ax.legend(loc='upper right')
    ax1 = fig.add_subplot(plt_num, 1, 2, projection='3d')
    ax1.scatter3D(wavelet.real, idx, wavelet.imag)
    if plt_num == 3:
        ax2 = fig.add_subplot(313)
        ax2.set_title('Caution')
        ax2.text(0.05, 0.1, wavelet_obj.help)
        ax2.tick_params(labelbottom=False, labelleft=False, labelright=False,
                        labeltop=False, bottom=False, left=False, right=False,
                        top=False)
    if show:
        plt.show()
    return fig


def _tick_spec(n_cells: int, rng, cells_per_unit: float):
    """(positions, labels) for a ``(start, stop, step)`` range spec laid
    over an axis of ``n_cells`` image cells.  Matches the reference's tick
    arithmetic (``base.py:506-510``): labels are ``arange(start, stop,
    step)`` and positions advance ``step * cells_per_unit`` cells.
    """
    labels = np.arange(*rng)
    positions = np.arange(0, n_cells, rng[2] * cells_per_unit)
    return positions, labels


def plot_tf(data, sfreq: float = 1000, frange: Floats = None,
            trange: Floats = None, vmin: Optional[float] = None,
            vmax: Optional[float] = None, cmap: str = 'RdBu_r',
            show: bool = True):
    """Time-frequency heatmap, rendered like the reference's
    (``base.py:492-520``): frequency rows bottom-up (inverted image y),
    a slim colorbar hugging the right edge, and ``frange``/``trange`` as
    ``(start, stop, step)`` tick specs — frequency steps in rows-per-Hz
    units derived from the plotted band, time steps in seconds at
    ``sfreq``.
    """
    import matplotlib.pyplot as plt

    data = np.asarray(data)
    n_f, n_t = data.shape
    fig, ax = plt.subplots()
    image = ax.imshow(data, vmin=vmin, vmax=vmax, cmap=cmap, aspect='auto',
                      origin='lower')
    if frange is not None:
        ax.set_yticks(*_tick_spec(n_f, frange,
                                  n_f / (frange[1] - frange[0])))
    if trange is not None:
        ax.set_xticks(*_tick_spec(n_t, trange, sfreq))
    # Slim bar pinned to the image's right edge (the reference uses an
    # axes_grid1 divider for the same 2%-wide geometry).
    fig.colorbar(image, cax=ax.inset_axes((1.01, 0.0, 0.02, 1.0)))
    if show:
        plt.show()
    return ax
