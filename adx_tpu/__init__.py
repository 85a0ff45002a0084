"""adx_tpu — TPU-native audio-deepfake-explainability framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
"Audio-Deepfake-Explainability" system (explainable fake-song detection):

* ``adx_tpu.ops``        — JAX DSP primitives (STFT/ISTFT, mel, Griffin-Lim,
                           dB scaling, band/patch/RISE/LIME mask construction).
* ``adx_tpu.models``     — SpecTTTra classifier family and a Spleeter-style
                           source-separation UNet, both in flax; torch/TF
                           weight converters.
* ``adx_tpu.predict``    — the Predictor layer (device-resident batched
                           inference; thin remote-API parity client).
* ``adx_tpu.parallel``   — device-mesh construction and perturbation-batch
                           sharding (pjit / shard_map over ICI).
* ``adx_tpu.runtime``    — the batched perturb→resynthesize→forward engine,
                           profiler, and experiment checkpointing.
* ``adx_tpu.explainers`` — occlusion / RISE saliency, frequency-band
                           perturbation (FBP), and AudioLIME engines.
* ``adx_tpu.features``   — physically-interpretable audio feature pipeline.
* ``adx_tpu.io``         — audio files, YAML configs, result-JSON merging.
* ``adx_tpu.viz``        — matplotlib/seaborn reporting layer.
* ``adx_tpu.dataprep``   — loudness normalization + degradation pipeline.
* ``adx_tpu.training``   — SpecTTTra fine-tuning (sharded train step).

The unit of parallelism is the *perturbation batch* (occlusion patches, FBP
bands, RISE masks, LIME stem masks): one batched mask tensor, one vmapped
resynthesis + classifier forward XLA program, one reduction — instead of the
reference's serial per-mask Python loops
(reference: src/spectrogram_explainability.py:665-703,
src/dsp_band_ops.py:573-653, src/lime_explainer.py:292-301).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps ``import adx_tpu`` light)."""
    import importlib

    top = {
        "LocalSonics": ("adx_tpu.predict", "LocalSonics"),
        "RemoteSonics": ("adx_tpu.predict", "RemoteSonics"),
        "PerturbationEngine": ("adx_tpu.runtime.engine", "PerturbationEngine"),
        "FrequencyBandPerturbation": ("adx_tpu.explainers.fbp", "FrequencyBandPerturbation"),
        "SpectrogramExplainability": ("adx_tpu.explainers.occlusion", "SpectrogramExplainability"),
        "run_lime_experiment_safe": ("adx_tpu.explainers.lime_explainer", "run_lime_experiment_safe"),
        "extract_all_features": ("adx_tpu.features.extraction", "extract_all_features"),
        "run_sonics_predictions": ("adx_tpu.predictions", "run_sonics_predictions"),
        "explain_track": ("adx_tpu.explain", "explain_track"),
        "make_server": ("adx_tpu.serving", "make_server"),
        "serve": ("adx_tpu.serving", "serve"),
    }
    if name in top:
        module, attr = top[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'adx_tpu' has no attribute {name!r}")


import os as _os

# Persistent XLA compilation cache: the experiment drivers re-launch python
# per sweep, and SpecTTTra-sized programs take 20-40 s to compile on TPU.
# The cache turns every rerun after the first into a warm start.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache = _os.path.expanduser("~/.cache/adx_tpu_xla")
    try:
        _os.makedirs(_cache, exist_ok=True)
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass

