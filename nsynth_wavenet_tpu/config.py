"""Typed experiment configuration.

The reference uses two config layers: per-run JSON loaded into an untyped
``argparse.Namespace`` with scattered ``getattr`` defaults
(train_wavenet.py:43-56, wavenet.py:105-111), plus compile-time module flags
(parallel_wavenet.py:11-29, masked.py:25, train_wavenet.py:14).  Here both
layers fold into typed dataclasses; ``from_json`` accepts the reference's
JSON schema directly (config_jsons/*.json), so the five supported configs
load unchanged.
"""

import dataclasses
import json
from typing import Optional, Tuple

# Piecewise-constant LR schedule {step: lr}, reference wavenet/wavenet.py:7-14.
DEFAULT_LR_SCHEDULE = (
    (0, 2e-4),
    (90000, 4e-4 / 3),
    (120000, 6e-5),
    (150000, 4e-5),
    (180000, 2e-5),
    (210000, 6e-6),
    (240000, 2e-6),
)


def _tupleize(x):
    if isinstance(x, (list, tuple)):
        return tuple(_tupleize(v) for v in x)
    return x


@dataclasses.dataclass(frozen=True)
class WavenetConfig:
    """Teacher WaveNet hparams (reference wavenet/wavenet.py:97-135)."""

    num_iters: int = 200000
    wave_length: int = 7680
    num_stages: int = 10
    num_layers: int = 30
    filter_length: int = 3
    width: int = 512
    skip_width: int = 256
    deconv_width: int = 256
    deconv_config: Tuple[Tuple[int, int], ...] = ((40, 10), (80, 20))
    use_mu_law: bool = True
    loss_type: str = "ce"  # ce | mol | gauss
    mol_mix: int = 10
    use_weight_norm: bool = False
    double_gate_width: bool = True
    use_resize_conv: bool = False
    upsample_act: str = "tanh"
    use_as_teacher: bool = False
    dropout_inputs: bool = False
    dropout_all: bool = False
    dropout_rate: Optional[float] = None
    lr_schedule: Tuple[Tuple[int, float], ...] = DEFAULT_LR_SCHEDULE
    # --- framework-level knobs (module flags in the reference) ---
    grad_clip: bool = False  # reference train_wavenet.py:14
    # reference DETAIL_LOG module flag (wavenet.py:17): deconv-activation
    # histograms (wavenet.py:68-71) + gauss-head mean/std/log_std
    # histograms (wavenet.py:308-312) in the train metrics
    detail_log: bool = False
    compute_dtype: str = "bfloat16"  # MXU contraction dtype; f32 accumulation
    # rematerialize each dilated-conv layer in the backward pass: trades
    # ~25% more conv FLOPs for not storing the gate/residual activations
    # ([B, 7680, gate_width] x num_layers), letting per-chip batches 16-32
    # fit HBM (ROADMAP item: B=32 "fails to fit" without it)
    remat: bool = False

    def __post_init__(self):
        assert not (self.dropout_inputs and self.dropout_all)
        assert self.loss_type in ("ce", "mol", "gauss"), self.loss_type

    @property
    def quant_chann(self) -> int:
        return 2**8 if self.use_mu_law else 2**16

    @property
    def out_width(self) -> int:
        if self.loss_type == "ce":
            return self.quant_chann
        if self.loss_type == "mol":
            return self.mol_mix * 3
        return 2  # gauss

    @property
    def gate_width(self) -> int:
        return 2 * self.width if self.double_gate_width else self.width

    @property
    def frame_shift(self) -> int:
        out = 1
        for _, s in self.deconv_config:
            out *= s
        return out

    @property
    def resolved_dropout_rate(self) -> float:
        if self.dropout_rate is not None:
            return self.dropout_rate
        return 0.5 if self.dropout_inputs else 0.05

    @property
    def max_dilation(self) -> int:
        return 2 ** (self.num_stages - 1)


@dataclasses.dataclass(frozen=True)
class ParallelWavenetConfig:
    """IAF student hparams (reference wavenet/parallel_wavenet.py:118-154)
    plus the module flags from parallel_wavenet.py:11-29."""

    num_iters: int = 400000
    wave_length: int = 7680
    num_stages: int = 10
    num_iaf_layers: Tuple[int, ...] = (10, 10, 10, 30)
    filter_length: int = 3
    width: int = 64
    deconv_width: int = 256
    deconv_config: Tuple[Tuple[int, int], ...] = ((40, 10), (80, 20))
    use_mu_law: bool = False
    loss_type: str = "logistic"  # logistic | gauss
    use_weight_norm: bool = False
    use_resize_conv: bool = False
    use_share_deconv: bool = False
    use_teacher_deconv: bool = False
    upsample_act: str = "tanh"
    num_samples: int = 100
    power_loss_factor: float = 0.0
    contrastive_loss_factor: float = 0.0
    lr_schedule: Tuple[Tuple[int, float], ...] = DEFAULT_LR_SCHEDULE
    # --- module flags folded in (reference parallel_wavenet.py:11-29) ---
    manual_final_init: bool = True
    use_log_scale: bool = False
    clip: bool = False
    norm_feat: bool = False
    use_priority_freq: bool = True
    use_l1_loss: bool = False
    spec_enhance_factor: int = 1  # 0 log | 1 abs | 2 pow | 3 combine
    use_mel: bool = False
    # --- framework-level knobs ---
    grad_clip: bool = False
    # reference DETAIL_LOG (parallel_wavenet.py:279-282): per-flow
    # scale/log_scale/mean scalars + the shared/per-flow deconv histograms
    detail_log: bool = False
    # Gauss (ClariNet) KL teacher-sigma floor: scale_p is clamped to at
    # least this before the closed-form KL + regularizer.  0.0 = the
    # reference's exact math (parallel_wavenet.py:404-428), which is
    # BRITTLE against sharp teachers: a near-deterministic sigma_p blows
    # up the (mean_p-mean_q)^2/(2 var_p) term and the 4*(dlogsigma)^2
    # regularizer drags sigma_q into collapse (measured: the symmetric
    # 100k gauss pairing fails with scale_tot 0.024 -> 0.006 — RESULTS.md
    # round 5; the reference's own ClariNet sample is a filed failure
    # case).  ClariNet (Ping et al. 2019) clips log sigma for exactly
    # this reason.
    kl_sigma_floor: float = 0.0
    compute_dtype: str = "bfloat16"
    # rematerialize the teacher's scoring forward in the KL backward pass
    # (stores ~30 layers x [B, 7680, 512] of teacher activations otherwise).
    # Off by default: on a 16 GB chip the full-size distillation step fits
    # without remat at B=4 and runs 1.21x faster (193 vs 234 ms/step);
    # enable for larger per-chip batches or bigger teachers.
    remat_teacher: bool = False

    def __post_init__(self):
        assert not (self.use_share_deconv and self.use_teacher_deconv)
        assert self.loss_type in ("logistic", "gauss"), self.loss_type

    @property
    def quant_chann(self) -> int:
        return 2**8 if self.use_mu_law else 2**16

    @property
    def out_width(self) -> int:
        return 2  # mean, scale

    @property
    def gate_width(self) -> int:
        # IAF flows never double the gate width (parallel_wavenet.py:209)
        return self.width

    @property
    def frame_shift(self) -> int:
        out = 1
        for _, s in self.deconv_config:
            out *= s
        return out

    @property
    def max_dilation(self) -> int:
        return 2 ** (self.num_stages - 1)

    @property
    def effective_use_priority_freq(self) -> bool:
        # mutex with use_mel (reference parallel_wavenet.py:29)
        return False if self.use_mel else self.use_priority_freq


_WAVENET_FIELDS = {f.name for f in dataclasses.fields(WavenetConfig)}
_PWN_FIELDS = {f.name for f in dataclasses.fields(ParallelWavenetConfig)}


def _from_dict(cls, fields, d, **overrides):
    known = {k: _tupleize(v) for k, v in d.items() if k in fields}
    unknown = {k for k in d if k not in fields and k != "use_input_noise"}
    if unknown:
        raise ValueError(f"Unknown config keys for {cls.__name__}: {sorted(unknown)}")
    known.update(overrides)
    return cls(**known)


def wavenet_config_from_dict(d: dict, **overrides) -> WavenetConfig:
    return _from_dict(WavenetConfig, _WAVENET_FIELDS, d, **overrides)


def pwn_config_from_dict(d: dict, **overrides) -> ParallelWavenetConfig:
    return _from_dict(ParallelWavenetConfig, _PWN_FIELDS, d, **overrides)


def load_config(path: str, **overrides):
    """Load a reference-schema JSON config; dispatch on ``num_iaf_layers``."""
    with open(path, "rt") as f:
        d = json.load(f)
    if "num_iaf_layers" in d:
        return pwn_config_from_dict(d, **overrides)
    return wavenet_config_from_dict(d, **overrides)


def config_to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def _git_branch() -> str:
    """Current git branch of the working directory, '' when not a repo or
    on the default branch (the reference appends the branch to the run
    slug only when it isn't master, auxilaries/config_str.py:109-116)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "--abbrev-ref", "HEAD"],
            capture_output=True, text=True, timeout=5,
        )
        branch = out.stdout.strip()
    except Exception:
        return ""
    if out.returncode != 0 or branch in ("master", "main", "HEAD", ""):
        return ""
    return branch


def config_slug(cfg, model_tag: str, exp_tag: str = "") -> str:
    """Run-directory slug with full encoding parity to the reference's
    experiment-bookkeeping contract (auxilaries/config_str.py:9-107): every
    hparam/flag the reference encodes appears with the same tag vocabulary —
    ns_ prefix, wn/pwn model id (+tag), MU/n_MU, WN[_DDI][_mfinit]/n_WN,
    RS/TS, upsample act, and for the student LOGS/CLIP/spec-feature/MEL/
    L1-L2/PFS/deconv-sharing tags; DIN/DA/n_DO dropout tags for the teacher;
    uppercased loss type last.  Framework extras (power/contrastive factors,
    grad clip) and the non-default git branch are appended after.

    The reference gates '_DDI' on the git branch name (config_str.py:30-34);
    here data-dependent init is unconditional under weight norm, so WN
    always carries _DDI.  '-NM' (USE_NEW_MEL_EXTRACTOR, reader.py:30) is
    omitted: that flag defaults False in the reference and the classic
    extractor is the only one wired into training here.
    """
    is_pwn = hasattr(cfg, "num_iaf_layers")
    extras = []  # framework-only tags, appended after the reference segment
    model_str = "pwn" if is_pwn else "wn"
    if exp_tag:
        model_str = f"{model_str}_{exp_tag}"
    parts = ["ns_" + model_str]
    parts.append("MU" if cfg.use_mu_law else "n_MU")
    if cfg.use_weight_norm:
        wn_tag = "WN_DDI"
        if is_pwn and cfg.manual_final_init:
            wn_tag += "_mfinit"
        parts.append(wn_tag)
    else:
        parts.append("n_WN")
    parts.append("RS" if cfg.use_resize_conv else "TS")
    parts.append(cfg.upsample_act)
    if is_pwn:
        parts.append("LOGS" if cfg.use_log_scale else "n_LOGS")
        parts.append("CLIP" if cfg.clip else "n_CLIP")
        sef_tag = {0: "LABS", 1: "ABS", 2: "POW", 3: "COM"}[cfg.spec_enhance_factor]
        parts.append(("N" if cfg.norm_feat else "") + sef_tag)
        parts.append("MEL" if cfg.use_mel else "n_MEL")
        parts.append("L1" if cfg.use_l1_loss else "L2")
        parts.append("PFS" if cfg.use_priority_freq else "n_PFS")
        if cfg.use_share_deconv:
            parts.append("SHA_DC")
        elif cfg.use_teacher_deconv:
            parts.append("TEA_DC")
        else:
            parts.append("SEP_DC")
        if cfg.power_loss_factor:
            extras.append(f"pl{cfg.power_loss_factor:g}")
        if cfg.contrastive_loss_factor:
            extras.append(f"cl{cfg.contrastive_loss_factor:g}")
    else:
        if not cfg.dropout_inputs and not cfg.dropout_all:
            parts.append("n_DO")
        elif cfg.dropout_inputs:
            parts.append("DIN")
        else:
            parts.append("DA")
    if cfg.grad_clip:
        extras.append("GC")
    if cfg.loss_type:
        parts.append(cfg.loss_type.upper())
    parts += extras
    branch = _git_branch()
    if branch:
        parts.append(branch.replace("/", "_"))
    return "-".join(parts)
