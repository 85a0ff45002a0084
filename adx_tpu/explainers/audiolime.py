"""AudioLIME — stem-level LIME, native and batched.

The reference depends on the external ``audioLIME`` package
(``SpleeterFactorization`` + ``LimeAudioExplainer`` — reference:
src/lime_explainer.py:17-18, 386-401), whose explain_instance runs 500
masked stem recombinations through the predictor one at a time. This module
reimplements both classes natively with the same API surface:

* masked recombinations are a ``[N, S] @ [S, n]`` matmul + batched forward
  (``PerturbationEngine.stem_mix_probs``) — one XLA program per chunk;
* the surrogate fit is the standard LIME pipeline: cosine distance to the
  all-ones row, ``sqrt(exp(-d²/kw²))`` kernel, weighted ridge regression
  (sklearn, host-side — the design matrix is [500, 4]).

API note: ``Explanation.local_exp[label]`` lists ``(feature_idx, weight)``
in *feature order* so that the reference's positional
``zip(factorization._components_names, weights)`` (src/lime_explainer.py:
404-407) maps weights to the correct stems.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from adx_tpu.explainers.separation import separate
from adx_tpu.ops.masks import lime_mask_batch


class SpleeterFactorization:
    """Stem factorization of a mixture (audioLIME-compatible surface).

    ``temporal_segmentation_params=1`` (the only mode the reference uses)
    means one temporal segment — the interpretable components are exactly
    the stems.
    """

    def __init__(
        self,
        input: np.ndarray,  # noqa: A002 — audioLIME's parameter name
        target_sr: int = 44100,
        temporal_segmentation_params: int = 1,
        composition_fn: Optional[Callable] = None,
        model_name: str = "spleeter:4stems",
    ):
        if temporal_segmentation_params != 1:
            raise NotImplementedError(
                "Only temporal_segmentation_params=1 is supported (the mode "
                "the reference uses, src/lime_explainer.py:389)"
            )
        # A jax-array mixture keeps the whole factorization device-resident:
        # stems for a 120 s track are 85 MB and the TPU tunnel moves
        # ~15 MB/s, so avoiding the D2H+H2D round trip to the LIME sweep
        # saves ~10 s per track. numpy input keeps the host semantics the
        # reference flows (stem WAV export etc.) rely on.
        import jax

        self.on_device = isinstance(input, jax.Array)
        if self.on_device:
            import jax.numpy as jnp

            self.input = input.astype(jnp.float32)
        else:
            self.input = np.asarray(input, dtype=np.float32)
        self.target_sr = target_sr
        self.model_name = model_name
        self.composition_fn = composition_fn or (lambda x: x)

        stems = separate(
            self.input, target_sr, model_name=model_name, device=self.on_device
        )
        self._components_names: List[str] = list(stems.keys())
        self.components: List[np.ndarray] = [stems[n] for n in self._components_names]
        self.original_components = self.components

    def get_number_components(self) -> int:
        return len(self.components)

    def compose_model_input(self, mask: Optional[Sequence[int]] = None) -> np.ndarray:
        """Sum of the stems selected by ``mask`` (all when None)."""
        if mask is None:
            mask = np.ones(len(self.components))
        mask = np.asarray(mask, dtype=np.float32)
        out = self.input * 0.0  # stays on device when the input does
        for m, comp in zip(mask, self.components):
            if m:
                out = out + m * comp[: len(out)]
        return self.composition_fn(out)


class Explanation:
    """Minimal LIME explanation record (audioLIME-compatible fields)."""

    def __init__(
        self,
        top_labels: List[int],
        local_exp: Dict[int, List[Tuple[int, float]]],
        intercept: Dict[int, float],
        score: Dict[int, float],
        components_names: List[str],
    ):
        self.top_labels = top_labels
        self.local_exp = local_exp
        self.intercept = intercept
        self.score = score
        self._components_names = components_names

    def as_dict(self, label: Optional[int] = None) -> Dict[str, float]:
        label = label if label is not None else self.top_labels[0]
        return {
            self._components_names[i]: w for i, w in self.local_exp[label]
        }


class LimeAudioExplainer:
    """LIME over stem on/off perturbations (audioLIME-compatible surface).

    ``engine`` (a ``PerturbationEngine``) enables the fast path: all masked
    recombinations run as batched device programs. Without it, ``predict_fn``
    is called once with the whole ``[N, n]`` waveform batch (it must accept a
    batch, as the reference's ``predict_fn_unified`` does,
    src/lime_explainer.py:283-301).
    """

    def __init__(self, kernel_width: float = 0.25, random_seed: int = 0, verbose: bool = False):
        self.kernel_width = kernel_width
        self.random_seed = random_seed
        self.verbose = verbose

    def explain_instance(
        self,
        factorization: SpleeterFactorization,
        predict_fn: Optional[Callable] = None,
        num_samples: int = 500,
        top_labels: int = 1,
        labels: Tuple[int, ...] = (1,),
        engine=None,
    ) -> Explanation:
        import jax

        n_comp = factorization.get_number_components()
        data = lime_mask_batch(jax.random.key(self.random_seed), num_samples, n_comp)

        n = len(factorization.input)
        if getattr(factorization, "on_device", False):
            import jax.numpy as jnp

            stems = jnp.stack([c[:n] for c in factorization.components])
        else:
            stems = np.stack([c[:n] for c in factorization.components])

        if engine is not None:
            # engine.stem_mix_probs dedups duplicate rows internally
            fake_probs = engine.stem_mix_probs(stems, data)
        else:
            # mixes are deterministic in the mask row: forward the ≤2^S
            # unique rows, scatter back to the N-sample design matrix
            uniq, inv = np.unique(data, axis=0, return_inverse=True)
            waves = uniq @ stems  # [U, n]
            fake_probs = np.asarray(predict_fn(waves))[inv]

        return self.fit(
            np.asarray(data), np.asarray(fake_probs),
            factorization._components_names,
            top_labels=top_labels, labels=labels,
        )

    def fit(
        self,
        data: np.ndarray,
        fake_probs: np.ndarray,
        components_names: List[str],
        top_labels: int = 1,
        labels: Tuple[int, ...] = (1,),
    ) -> Explanation:
        """Surrogate fit from an already-computed probability vector.

        Split out of :meth:`explain_instance` so the multi-track batched
        path (``adx_tpu.explain.explain_tracks`` via
        ``engine.stem_mix_probs_multi``) reuses the exact same kernel /
        ridge pipeline per track. ``fake_probs`` is either the ``[N]``
        fake-class probability vector or an already-stacked ``[N, labels]``
        probability matrix (what a raw ``predict_fn`` returns)."""
        fake_probs = np.asarray(fake_probs)
        if fake_probs.ndim == 1:
            probs = np.stack([1.0 - fake_probs, fake_probs], axis=1)
        else:
            probs = fake_probs

        # cosine distance to the unperturbed instance (row 0, all ones)
        ref = data[0]
        num = data @ ref
        den = np.linalg.norm(data, axis=1) * np.linalg.norm(ref) + 1e-12
        distances = 1.0 - num / den
        weights = np.sqrt(np.exp(-(distances**2) / self.kernel_width**2))

        if top_labels:
            label_order = list(np.argsort(probs[0])[::-1][:top_labels])
        else:
            label_order = list(labels)

        from sklearn.linear_model import Ridge

        local_exp: Dict[int, List[Tuple[int, float]]] = {}
        intercept: Dict[int, float] = {}
        score: Dict[int, float] = {}
        for label in label_order:
            model = Ridge(alpha=1.0, fit_intercept=True, random_state=self.random_seed)
            model.fit(data, probs[:, label], sample_weight=weights)
            # feature order (see module docstring)
            local_exp[int(label)] = [(i, float(w)) for i, w in enumerate(model.coef_)]
            intercept[int(label)] = float(model.intercept_)
            score[int(label)] = float(model.score(data, probs[:, label], sample_weight=weights))
            if self.verbose:
                print(f"LIME label {label}: R²={score[int(label)]:.3f}")

        return Explanation(
            top_labels=[int(l) for l in label_order],
            local_exp=local_exp,
            intercept=intercept,
            score=score,
            components_names=components_names,
        )
