"""Functional core: on-device wavelet synthesis, the CWT hot path, and
fused post-processing.  Everything here is pure, jittable, and shape-static —
the class layer in ``ninwavelets_tpu.models`` is a thin parity veneer over
these functions.
"""
from .bank import (WaveletDef, WaveletMode, make_fft_bank, make_fft_bank_ri,
                   make_fft_wavelet, make_fft_wavelet_ri, make_time_wavelet,
                   make_time_wavelet_ri, pad_spectrum_to)
from .baseline import (Baseline, baseline_correct, baseline_of, baseline_tf,
                       METHODS as BASELINE_METHODS)
from .cwt import (abs_from_bank, analytic_spectrum, cwt_abs, cwt_from_bank,
                  cwt_ri, itc, itc_from_bank, mean_power,
                  mean_power_from_bank, power, power_from_bank, split_complex)
from .fit import fit_frequencies, learn_bank
from .connectivity import (coherence_matrix, coherence_matrix_from_bank,
                           lagged_coherence, lagged_coherence_morse,
                           erpac, erpac_from_banks,
                           nm_plv, nm_plv_from_bank, pac, pac_from_banks,
                           pac_pair, pac_pair_from_banks,
                           pac_significance,
                           pair_matrix_scan, phase_lag, phase_lag_auto,
                           phase_lag_significance,
                           phase_lag_from_bank, phase_lag_from_sums,
                           phase_lag_sums, plv, plv_from_bank,
                           plv_matrix, plv_matrix_from_bank,
                           plv_significance, plv_sums, ppc, ppc_auto,
                           ppc_from_bank, ppc_matrix, ppc_matrix_from_bank,
                           kuramoto_order, kuramoto_order_from_bank,
                           partial_coherence,
                           partial_coherence_from_bank,
                           psi_matrix, psi_matrix_from_bank,
                           surrogate_pvalues, wpli_matrix,
                           wpli_matrix_from_bank)
from .bootstrap import bootstrap_ci
from .bursts import (BurstSummary, burst_summary, burst_table,
                     burst_threshold)
from .cluster import (ClusterResult, TfceResult, cluster_mass,
                      cluster_test_f, cluster_test_independent,
                      f_oneway, f_threshold,
                      cluster_test_one_sample, cluster_test_paired,
                      cluster_test_regression, t_regression,
                      fdr_correction,
                      label_components, max_stat_test_independent,
                      max_stat_test_one_sample, max_stat_test_regression,
                      t_independent, t_one_sample,
                      t_threshold, tfce_map, tfce_test_independent,
                      tfce_test_one_sample)
from .dwt import (imodwt, max_level, modwt, modwt_corr, modwt_cov,
                  modwt_denoise, modwt_mra, modwt_var, modwt_var_ci,
                  pow2_pad, wavedec, waverec, wavelet_filter)
from .wpt import (best_basis, best_basis_reconstruct, imodwpt, modwpt,
                  node_band)
from .extensions import (bicoherence, bicoherence_from_banks, cfd,
                         cfd_from_banks, imcoh,
                         imcoh_auto, imcoh_from_bank, imcoh_from_sums,
                         psi, psi_from_bank, psi_from_sums,
                         bump_spectrum, cross_power_from_bank,
                         dog_spectrum, epoch_coherence_from_bank,
                         paul_spectrum, wavelet_coherence,
                         wavelet_coherence_from_bank, wavelet_entropy,
                         wtc_significance)
from .fused import (fused_itc, fused_itc_from_bank, fused_mean_power,
                    fused_mean_power_from_bank, itc_auto, mean_power_auto)
from .granger import (conditional_granger, dtf_pdc, granger_from_factors,
                      spectral_granger_pairwise, uniform_freqs,
                      wavelet_conditional_granger, wavelet_dtf_pdc,
                      wavelet_granger,
                      wavelet_granger_significance, wilson_factorize)
from .graph import (char_path_length, clustering_onnela,
                    modularity_communities,
                    global_efficiency, shortest_paths, small_worldness,
                    strength)
from .grids import (analytic_mask, fft_bin_freqs, log_freqs,
                    reverse_timeline, wavelet_timeline)
from .decoding import (cca_reference, csp_decode, decode_auc,
                       ssvep_cca, temporal_generalization, tf_decode)
from .denoise import denoise, denoise_from_bank
from .envelope import env_corr_matrix, env_corr_matrix_from_bank
from .cpd import cp_decompose, cp_reconstruct
from .csd import (csd_transform, interpolate_channels,
                  interpolation_matrix, spline_matrices)
# NOTE: the bare `csd` FUNCTION is deliberately not imported here — it
# would shadow the `ops.csd` MODULE (the ewt/vmd/emd lesson).  Reach it
# as `ops.csd.csd`, or via `EpochsWavelet.csd`.
from .complexity import (dfa, multiscale_entropy,
                         multiscale_permutation_entropy,
                         permutation_entropy, sample_entropy)
from .cycles import CycleTable, cycle_features
from .emd import eemd
from .emd import emd as empirical_mode_decomposition
from .filtering import bandpass, highpass, lowpass, notch, resample
from .asr import ASRModel, asr_calibrate, asr_process
from .leadfield import (fibonacci_electrodes, fit_dipole,
                        fit_dipole_evoked, fit_dipole_meg,
                        source_grid, sphere_leadfield,
                        sphere_leadfield_meg)
from .beamformer import (DICSResult, LCMVResult,
                         MinimumNormResult, dics, lcmv,
                         lcmv_apply, minimum_norm,
                         minimum_norm_apply,
                         source_coherence, wavelet_csd)
from .hmm import HMMResult, hmm_fit, viterbi
from .trf import (TRFResult, lagged_design, trf_cv, trf_fit,
                  trf_predict)
from .riemann import (epoch_covariances, mdm_decode,
                      riemannian_distance, riemannian_mean,
                      spd_expm, spd_logm, spd_sqrtm,
                      tangent_decode, tangent_space)
from .sleep import (EventTable, detect_slow_oscillations,
                    detect_spindles)
from .erp import (PeakResult, evoked, fractional_area_latency,
                  fractional_peak_onset, jackknife_onsets,
                  mean_amplitude, peak_measures)
from .reject import (RejectResult, autoreject_global,
                     find_bad_channels, ptp, ptp_reject, regress_out)
from .microstates import (MicrostateResult, gfp, microstate_backfit,
                          microstate_fit, microstate_stats,
                          microstate_syntax_test)
from .ica import (ICAResult, fastica, ica_find_bads, ica_kurtosis,
                  ica_remove, ica_scores, ica_transform)
from .spatial import (SpatialResult, corrca, covariance, csp,
                      csp_features, ged, ledoit_wolf, spatial_apply,
                      ssd, xdawn)
from .cwt2d import cwt2, morlet2d_bank, pow2_pad2, power2d
from .dwt2d import dwt2, idwt2, max_level2, wavedec2, waverec2
from .ewt import ewt_boundaries, ewt_filterbank, ewt_reconstruct
from .ewt import ewt as empirical_wavelet_transform
from .vmd import hilbert_spectrum, instantaneous, mvmd
from .vmd import vmd as variational_mode_decomposition
from .mp import (MPResult, gabor_dictionary, matching_pursuit,
                 mp_tfr)
from .multitaper import (multitaper_banks, multitaper_coherence_matrix,
                         multitaper_mean_power,
                         multitaper_partial_coherence,
                         multitaper_power, multitaper_power_from_banks)
from .irasa import IrasaResult, aperiodic_fit, irasa, welch_psd
from .icwt import coverage, icwt_from_bank, icwt_ri
from .ridge import (extract_modes, extract_modes_ri, extract_ridge,
                    ridge_frequencies)
from .scattering import (lowpass_spectrum, scattering,
                         scattering_from_banks)
from .superlets import (superlet_banks, superlet_mean_power,
                        superlet_power, superlet_power_from_banks,
                        superlet_weights)
from .stockwell import istockwell, stockwell, stockwell_ri
from .specparam import (SpectralFit, aperiodic_model, peaks_model,
                        specparam)
from .reassign import reassigned_mean_power, reassigned_power
from .sst import (ssq_mean_power, ssq_mean_power_from_bank, ssq_power,
                  ssq_power_from_bank)
from .tc_stats import (ar1_coefficient, background_power, coi_mask,
                       efolding_times, global_spectrum, itc_pvalue,
                       itc_threshold, red_noise_spectrum,
                       significance_level, significant_mask)
from .signal_utils import (MNE_CONSTANT, SizeError, hamming_window,
                           interpolate_alias, normalize, pad_to)
from .spectra import (MEXICAN_HAT_PEAK_FREQ, haar_time, mexican_hat_time,
                      morlet_norm_constants, morlet_peak_freq,
                      morlet_spectrum, morlet_time, morse_spectrum,
                      morse_taper_spectrum, shannon_spectrum)

__all__ = [
    "SpatialResult", "covariance", "ledoit_wolf", "csp",
    "csp_features", "ged",
    "spatial_apply", "ssd", "corrca", "xdawn",
    "WaveletDef", "WaveletMode", "make_fft_bank", "make_fft_bank_ri",
    "make_fft_wavelet", "make_fft_wavelet_ri", "make_time_wavelet",
    "make_time_wavelet_ri", "pad_spectrum_to",
    "Baseline", "baseline_correct", "baseline_of", "baseline_tf",
    "BASELINE_METHODS",
    "abs_from_bank", "analytic_spectrum", "cwt_abs", "cwt_from_bank",
    "cwt_ri", "itc", "itc_from_bank", "mean_power", "mean_power_from_bank",
    "power", "power_from_bank", "split_complex",
    "fused_mean_power", "fused_mean_power_from_bank", "mean_power_auto",
    "fused_itc", "fused_itc_from_bank", "itc_auto",
    "paul_spectrum", "dog_spectrum", "bump_spectrum",
    "cross_power_from_bank", "epoch_coherence_from_bank",
    "wavelet_coherence", "wavelet_coherence_from_bank",
    "wavelet_entropy", "wtc_significance",
    "bicoherence", "bicoherence_from_banks",
    "imcoh", "imcoh_auto", "imcoh_from_bank", "imcoh_from_sums",
    "psi", "psi_from_bank", "psi_from_sums", "cfd", "cfd_from_banks",
    "plv", "plv_from_bank", "plv_sums", "pac", "pac_from_banks",
    "nm_plv", "nm_plv_from_bank", "plv_significance", "surrogate_pvalues",
    "lagged_coherence", "lagged_coherence_morse",
    "pac_significance", "pac_pair_from_banks", "pac_pair",
    "erpac", "erpac_from_banks",
    "pair_matrix_scan", "plv_matrix", "plv_matrix_from_bank",
    "coherence_matrix", "coherence_matrix_from_bank",
    "phase_lag", "phase_lag_auto", "phase_lag_from_bank",
    "phase_lag_significance",
    "phase_lag_from_sums", "phase_lag_sums",
    "ppc", "ppc_auto", "ppc_from_bank",
    "wpli_matrix", "wpli_matrix_from_bank",
    "psi_matrix", "psi_matrix_from_bank",
    "partial_coherence", "partial_coherence_from_bank",
    "kuramoto_order", "kuramoto_order_from_bank",
    "ppc_matrix", "ppc_matrix_from_bank",
    "bootstrap_ci",
    "BurstSummary", "burst_summary", "burst_table", "burst_threshold",
    "ClusterResult", "cluster_mass", "cluster_test_independent",
    "cluster_test_f", "f_oneway", "f_threshold",
    "cluster_test_one_sample", "cluster_test_paired", "label_components",
    "cluster_test_regression", "t_regression",
    "max_stat_test_independent", "max_stat_test_one_sample",
    "max_stat_test_regression",
    "t_independent", "t_one_sample", "t_threshold",
    "TfceResult", "tfce_map", "tfce_test_one_sample",
    "tfce_test_independent", "fdr_correction",
    "modwt", "imodwt", "modwt_mra", "modwt_var", "modwt_denoise",
    "wavelet_filter", "max_level", "wavedec", "waverec", "pow2_pad",
    "modwt_cov", "modwt_corr", "modwt_var_ci",
    "modwpt", "imodwpt", "best_basis", "best_basis_reconstruct",
    "node_band",
    "icwt_from_bank", "icwt_ri", "coverage",
    "extract_modes", "extract_modes_ri",
    "denoise", "denoise_from_bank",
    "tf_decode", "decode_auc", "temporal_generalization",
    "env_corr_matrix", "env_corr_matrix_from_bank",
    "cp_decompose", "cp_reconstruct",
    "cycle_features", "CycleTable",
    "emd", "eemd", "empirical_mode_decomposition",
    # 2-D wavelets (the reference roadmap's one unbuilt item)
    "cwt2", "power2d", "morlet2d_bank", "pow2_pad2",
    "dwt2", "idwt2", "wavedec2", "waverec2", "max_level2",
    "hmm_fit", "viterbi", "HMMResult",
    "RejectResult", "autoreject_global", "ptp", "ptp_reject",
    "regress_out", "find_bad_channels",
    "EventTable", "detect_spindles", "detect_slow_oscillations",
    "ASRModel", "asr_calibrate", "asr_process",
    "LCMVResult", "lcmv", "lcmv_apply",
    "sphere_leadfield", "fibonacci_electrodes", "source_grid",
    "fit_dipole", "fit_dipole_evoked", "sphere_leadfield_meg",
    "fit_dipole_meg",
    "DICSResult", "dics", "wavelet_csd", "source_coherence",
    "MinimumNormResult", "minimum_norm", "minimum_norm_apply",
    "epoch_covariances", "riemannian_distance", "riemannian_mean",
    "spd_logm", "spd_expm", "spd_sqrtm", "tangent_space",
    "mdm_decode", "tangent_decode",
    "TRFResult", "lagged_design", "trf_fit", "trf_predict",
    "trf_cv",
    "PeakResult", "evoked", "peak_measures", "mean_amplitude",
    "fractional_area_latency", "fractional_peak_onset",
    "jackknife_onsets",
    "csd_transform", "interpolate_channels",
    "interpolation_matrix", "spline_matrices",
    "sample_entropy", "multiscale_entropy", "permutation_entropy",
    "multiscale_permutation_entropy", "dfa",
    "MicrostateResult", "gfp", "microstate_fit", "microstate_backfit",
    "microstate_stats", "microstate_syntax_test",
    "fastica", "ica_transform", "ica_remove", "ICAResult",
    "ica_scores", "ica_kurtosis", "ica_find_bads",
    "bandpass", "lowpass", "highpass", "notch", "resample",
    # "ewt"/"vmd" are the SUBMODULES here (the transforms live at
    # ops.ewt.ewt / ops.vmd.vmd and as the long-name aliases below);
    # round 3 shipped the functions shadowing their modules — fixed r4.
    "ewt", "ewt_boundaries", "ewt_filterbank", "ewt_reconstruct",
    "empirical_wavelet_transform",
    "vmd", "mvmd", "instantaneous", "hilbert_spectrum",
    "variational_mode_decomposition",
    "superlet_banks", "superlet_weights", "superlet_power",
    "superlet_power_from_banks", "superlet_mean_power",
    "stockwell", "stockwell_ri", "istockwell",
    "specparam", "SpectralFit", "aperiodic_model", "peaks_model",
    "ssq_power", "ssq_power_from_bank", "ssq_mean_power",
    "reassigned_power", "reassigned_mean_power",
    "MPResult", "gabor_dictionary", "matching_pursuit", "mp_tfr",
    "IrasaResult", "irasa", "welch_psd", "aperiodic_fit",
    "ssq_mean_power_from_bank",
    "extract_ridge", "ridge_frequencies",
    "scattering", "scattering_from_banks", "lowpass_spectrum",
    "fit_frequencies", "learn_bank",
    "ar1_coefficient", "background_power", "coi_mask", "efolding_times",
    "global_spectrum", "red_noise_spectrum", "significance_level",
    "significant_mask", "itc_pvalue", "itc_threshold",
    "strength", "clustering_onnela", "shortest_paths", "csp_decode",
    "cca_reference", "ssvep_cca",
    "global_efficiency", "char_path_length", "small_worldness",
    "modularity_communities",
    "analytic_mask", "fft_bin_freqs", "log_freqs", "reverse_timeline",
    "wavelet_timeline",
    "MNE_CONSTANT", "SizeError", "hamming_window", "interpolate_alias",
    "normalize", "pad_to",
    "MEXICAN_HAT_PEAK_FREQ", "haar_time", "mexican_hat_time",
    "morlet_norm_constants", "morlet_peak_freq", "morlet_spectrum",
    "morlet_time", "morse_spectrum", "morse_taper_spectrum",
    "shannon_spectrum",
    "multitaper_banks", "multitaper_mean_power",
    "multitaper_coherence_matrix", "multitaper_partial_coherence", "multitaper_power",
    "multitaper_power_from_banks",
    "wilson_factorize", "spectral_granger_pairwise", "wavelet_granger",
    "wavelet_granger_significance", "granger_from_factors",
    "conditional_granger", "wavelet_conditional_granger",
    "dtf_pdc", "wavelet_dtf_pdc",
    "uniform_freqs",
]
