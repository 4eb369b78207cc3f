"""Parallel WaveNet student: stack of inverse-autoregressive-flow (IAF)
WaveNets distilled from a frozen teacher.

Functional re-design of reference wavenet/parallel_wavenet.py (512 LoC).
Semantics reproduced (SURVEY.md §2.3):

  * base noise: logistic(0,1) or normal(0,1) of length
    (num_frames * frame_shift // max_dilation) * max_dilation
    (parallel_wavenet.py:294-306)
  * each flow: WaveNet with gate_width == width and NO skip path; output
    head off the residual path; separate 1x1 out2_mean / out2_scale convs
    (parallel_wavenet.py:200-287)
  * scale = clip(softplus(s), e^-9, e^7) (USE_LOG_SCALE=False path,
    parallel_wavenet.py:105-114); manual final-layer scale-bias init -0.3
    (softplus) / -0.8 (log) instead of ddi (parallel_wavenet.py:87-103)
  * flow composition: x <- x*scale + mean; mean_tot <- mean + mean_tot*scale;
    scale_tot <- scale_tot*scale; log_scale_tot += log_scale; final
    new_x = x_base*scale_tot + mean_tot with e^7 clamps
    (parallel_wavenet.py:316-330)
  * deconv sharing modes: per-flow stacks / one shared 'iaf_share' stack /
    teacher's frozen stack (parallel_wavenet.py:130-135, 311-314)
  * losses: MC logistic KL (num_samples teacher-scored perturbations,
    parallel_wavenet.py:361-402), closed-form Gaussian KL + 4*(logσ diff)^2
    regularizer (:404-428), STFT power loss (:459-479), contrastive loss on
    a mismatched mel batch (:481-490)

TPU-native notes: the KL's teacher re-scoring runs the (replicated, frozen,
stop_gradient'ed) teacher inside the same jitted step; the num_samples
Monte-Carlo dimension broadcasts against the teacher's MoL params instead of
tf_repeat-materializing repeated rows.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nsynth_wavenet_tpu import config as config_lib
from nsynth_wavenet_tpu.models import wavenet as wavenet_lib
from nsynth_wavenet_tpu.ops import conv as conv_ops
from nsynth_wavenet_tpu.ops import distributions as dist
from nsynth_wavenet_tpu.ops import signal as sig
from nsynth_wavenet_tpu.ops import stft as stft_ops


class ParallelWavenet:
    def __init__(
        self,
        cfg: config_lib.ParallelWavenetConfig,
        teacher: Optional[wavenet_lib.Wavenet] = None,
    ):
        self.cfg = cfg
        self.teacher = teacher
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        if teacher is not None:
            t = teacher.cfg
            assert (
                (t.loss_type == "mol" and cfg.loss_type == "logistic")
                or (t.loss_type == "gauss" and cfg.loss_type == "gauss")
            ), (t.loss_type, cfg.loss_type)
            assert t.use_mu_law == cfg.use_mu_law
            assert t.use_resize_conv == cfg.use_resize_conv
            assert t.upsample_act == cfg.upsample_act

    @property
    def num_flows(self):
        return len(self.cfg.num_iaf_layers)

    @property
    def manual_final_bias(self):
        return -0.8 if self.cfg.use_log_scale else -0.3

    # -- parameters --------------------------------------------------------

    def init_params(self, key, num_mel: int = stft_ops.MEL_PARAMS.num_mel):
        """Param tree:
        {'deconv_share': {...}?, 'flows': [{'deconv': {...}?, 'start_conv',
         'layers': [{'dilated','mel_cond','res'}], 'out1', 'mel_cond_out1',
         'out2_mean', 'out2_scale'}]}
        """
        cfg = self.cfg
        wn = cfg.use_weight_norm
        params = {"flows": []}
        key, k_share = jax.random.split(key)
        if cfg.use_share_deconv or cfg.use_teacher_deconv:
            params["deconv_share"] = wavenet_lib.init_deconv_stack(
                k_share, cfg.deconv_config, num_mel, cfg.deconv_width, wn
            )
        for fi in range(self.num_flows):
            key, kd, ks, k1, kc1, km, ksc = jax.random.split(key, 7)
            flow = {}
            if not (cfg.use_share_deconv or cfg.use_teacher_deconv):
                flow["deconv"] = wavenet_lib.init_deconv_stack(
                    kd, cfg.deconv_config, num_mel, cfg.deconv_width, wn
                )
            flow["start_conv"] = conv_ops.conv1d_init(
                ks, 1, cfg.width, cfg.filter_length, use_weight_norm=wn
            )
            flow["layers"] = []
            for li in range(cfg.num_iaf_layers[fi]):
                key, kld, klc, klr = jax.random.split(key, 4)
                flow["layers"].append(
                    {
                        "dilated": conv_ops.conv1d_init(
                            kld, cfg.width, cfg.gate_width, cfg.filter_length,
                            use_weight_norm=wn,
                        ),
                        "mel_cond": conv_ops.conv1d_init(
                            klc, cfg.deconv_width, cfg.gate_width, 1, use_weight_norm=wn
                        ),
                        "res": conv_ops.conv1d_init(
                            klr, cfg.gate_width // 2, cfg.width, 1, use_weight_norm=wn
                        ),
                    }
                )
            flow["out1"] = conv_ops.conv1d_init(
                k1, cfg.width, cfg.width, 1, use_weight_norm=wn
            )
            flow["mel_cond_out1"] = conv_ops.conv1d_init(
                kc1, cfg.deconv_width, cfg.width, 1, use_weight_norm=wn
            )
            flow["out2_mean"] = conv_ops.conv1d_init(
                km, cfg.width, 1, 1, use_weight_norm=wn
            )
            bias = self.manual_final_bias if cfg.manual_final_init else 0.0
            flow["out2_scale"] = conv_ops.conv1d_init(
                ksc, cfg.width, 1, 1, use_weight_norm=wn, bias_init=bias
            )
            params["flows"].append(flow)
        return params

    # -- pieces ------------------------------------------------------------

    def scale_log_scale(self, scale_params):
        """(scale, log_scale) from the raw scale-conv output
        (reference PWNHelper.scale_log_scale_fn, parallel_wavenet.py:105-114)."""
        if self.cfg.use_log_scale:
            log_scale = jnp.clip(scale_params, -9.0, 7.0)
            return jnp.exp(log_scale), log_scale
        scale = jnp.clip(jax.nn.softplus(scale_params), np.exp(-9.0), np.exp(7.0))
        return scale, jnp.log(scale)

    def _flow_deconv(self, params, flow_params, mel, init, detail=None,
                     detail_prefix: str = ""):
        cfg = self.cfg
        if cfg.use_share_deconv or cfg.use_teacher_deconv:
            dp = params["deconv_share"]
        else:
            dp = flow_params["deconv"]
        enc, new_dp = wavenet_lib.apply_deconv_stack(
            dp,
            mel,
            deconv_config=cfg.deconv_config,
            upsample_act=cfg.upsample_act,
            use_resize_conv=cfg.use_resize_conv,
            init=init,
            dtype=None if init else self.dtype,
            out_dtype=None if init else self.dtype,
            detail=detail,
            detail_prefix=detail_prefix,
        )
        return enc, new_dp

    def _create_iaf(self, flow_params, x, mel_en, flow_idx, init):
        """One IAF flow (reference parallel_wavenet.py:200-287).

        x: [B, L, 1].  Returns dict(x, mean, scale, log_scale) + new params.
        """
        cfg = self.cfg
        dtype = None if init else self.dtype
        new_fp = dict(flow_params)
        new_fp["layers"] = list(flow_params["layers"])
        # MANUAL_FINAL_INIT: final mean/scale convs skip ddi and use the
        # manual scale bias so initial scale_tot ~ 0.05 (LJSpeech amplitude)
        final_init = init and not cfg.manual_final_init

        def apply(p, h, *, dilation=1, use_init=None, head=False):
            eff_init = init if use_init is None else use_init
            if eff_init:
                return conv_ops.conv1d_ddi(p, h, dilation=dilation)
            # out_dtype=dtype keeps the flow trunk's activation stream in
            # bf16 (same HBM-bound rationale as the teacher trunk,
            # models/wavenet.py apply); the mean/scale heads return f32 so
            # the IAF composition algebra (scale_tot products, log_scale
            # sums, reconstruction identity) stays full precision
            return conv_ops.conv1d(
                p, h, dilation=dilation, dtype=dtype,
                out_dtype=None if head else dtype,
            ), p

        l = conv_ops.shift_right(x)
        l, new_fp["start_conv"] = apply(flow_params["start_conv"], l)

        m = cfg.gate_width // 2
        for i in range(cfg.num_iaf_layers[flow_idx]):
            dilation = 2 ** (i % cfg.num_stages)
            lp = dict(flow_params["layers"][i])
            d, lp["dilated"] = apply(lp["dilated"], l, dilation=dilation)
            c, lp["mel_cond"] = apply(lp["mel_cond"], mel_en)
            d = wavenet_lib.condition_add(d, c)
            d = jax.nn.sigmoid(d[:, :, :m]) * jnp.tanh(d[:, :, m:])
            r, lp["res"] = apply(lp["res"], d)
            l = l + r
            new_fp["layers"][i] = lp

        l = jax.nn.relu(l)
        l, new_fp["out1"] = apply(flow_params["out1"], l)
        c, new_fp["mel_cond_out1"] = apply(flow_params["mel_cond_out1"], mel_en)
        l = wavenet_lib.condition_add(l, c)
        l = jax.nn.relu(l)

        mean, new_fp["out2_mean"] = apply(
            flow_params["out2_mean"], l, use_init=final_init, head=True
        )
        scale_params, new_fp["out2_scale"] = apply(
            flow_params["out2_scale"], l, use_init=final_init, head=True
        )

        scale, log_scale = self.scale_log_scale(scale_params)
        new_x = x * scale + mean
        return {
            "x": new_x,
            "mean": mean,
            "scale": scale,
            "log_scale": log_scale,
        }, new_fp

    # -- forward -----------------------------------------------------------

    def sample_length(self, num_frames: int) -> int:
        cfg = self.cfg
        return (num_frames * cfg.frame_shift // cfg.max_dilation) * cfg.max_dilation

    def base_noise(self, rng, batch_size: int, length: int):
        if self.cfg.loss_type == "logistic":
            return dist.logistic_0_1(rng, (batch_size, length))
        return jax.random.normal(rng, (batch_size, length))

    def feed_forward(self, params, inputs, rng=None, *, init: bool = False):
        """inputs: {'mel': [B, T, num_mel]} (+ optional 'base_x' [B, L] to
        bypass noise sampling).  Returns (ff_dict, new_params):
        {'x', 'mean_tot', 'scale_tot', 'log_scale_tot', 'rand_input'}.
        """
        cfg = self.cfg
        mel = inputs["mel"]
        B, num_frames, _ = mel.shape
        length = self.sample_length(num_frames)

        if "base_x" in inputs:
            x = inputs["base_x"]
            assert x.shape == (B, length), (x.shape, (B, length))
        else:
            assert rng is not None
            x = self.base_noise(rng, B, length)

        new_params = dict(params)
        new_params["flows"] = list(params["flows"])
        # DETAIL_LOG (reference parallel_wavenet.py:279-282): per-flow
        # scale/log_scale/mean scalars + deconv histograms, returned in the
        # ff dict so the train step can surface them as metrics
        detail = {} if (cfg.detail_log and not init) else None

        shared_enc = None
        if cfg.use_share_deconv or cfg.use_teacher_deconv:
            shared_enc, new_params["deconv_share"] = self._flow_deconv(
                params, None, mel, init, detail=detail
            )

        iaf_x = x[..., None]
        mean_tot, scale_tot, log_scale_tot = 0.0, 1.0, 0.0
        for fi in range(self.num_flows):
            fp = params["flows"][fi]
            if shared_enc is None:
                mel_en, new_dp = self._flow_deconv(
                    params, fp, mel, init, detail=detail,
                    detail_prefix=f"iaf_{fi}/",
                )
                fp = dict(fp)
                fp["deconv"] = new_dp
            else:
                mel_en = shared_enc
            iaf_dict, new_fp = self._create_iaf(fp, iaf_x, mel_en, fi, init)
            if shared_enc is None:
                new_fp["deconv"] = fp["deconv"]
            new_params["flows"][fi] = new_fp
            iaf_x = iaf_dict["x"]
            scale = iaf_dict["scale"]
            mean_tot = iaf_dict["mean"] + mean_tot * scale
            scale_tot = scale_tot * scale
            log_scale_tot = log_scale_tot + iaf_dict["log_scale"]
            if detail is not None:
                detail[f"scale_{fi}"] = jnp.mean(scale)
                detail[f"log_scale_{fi}"] = jnp.mean(iaf_dict["log_scale"])
                detail[f"mean_{fi}"] = jnp.mean(iaf_dict["mean"])

        mean_tot = mean_tot[..., 0]
        scale_tot = jnp.minimum(scale_tot, np.exp(7.0))[..., 0]
        log_scale_tot = jnp.minimum(log_scale_tot, 7.0)[..., 0]
        new_x = x * scale_tot + mean_tot

        ff = {
            "x": new_x,
            "mean_tot": mean_tot,
            "scale_tot": scale_tot,
            "log_scale_tot": log_scale_tot,
            "rand_input": x,
        }
        if detail is not None:
            ff["detail"] = detail
        return ff, new_params

    # -- losses ------------------------------------------------------------

    def _clip_quant_scale(self, x):
        """Clip + requantize the student sample to values seen in data
        (reference parallel_wavenet.py:347-359)."""
        cfg = self.cfg
        x = jnp.clip(x, -1.0, 1.0 - 2.0 / cfg.quant_chann)
        xq = sig.cast_quantize(x, cfg.quant_chann)
        if cfg.use_mu_law:
            return sig.inv_mu_law(xq)
        return sig.inv_cast_quantize(xq, cfg.quant_chann)

    def _clip_or_not(self, x):
        return self._clip_quant_scale(x) if self.cfg.clip else x

    def _teacher_out_params(self, teacher_params, x_scaled, mel):
        """Frozen teacher scoring forward; optionally rematerialized so the
        KL backward (which only needs d/dx through the teacher) recomputes
        the teacher activations instead of storing them (SURVEY.md §7 hard
        part 4: distillation-step memory)."""

        def f(tp, xs, m):
            ff, _ = self.teacher.feed_forward(tp, {"wav_scaled": xs, "mel": m})
            return ff["out_params"]

        if self.cfg.remat_teacher:
            f = jax.checkpoint(f)
        return f(teacher_params, x_scaled, mel)

    def kl_loss_logistic(self, teacher_params, ff_dict, rng, num_samples: int = 100):
        """Monte-Carlo KL( student || MoL teacher )
        (reference parallel_wavenet.py:361-402).

        The teacher scores the student's own sample path x once; num_samples
        logistic perturbations x_xp ~ L(mean_tot, scale_tot) are evaluated
        under the teacher's (broadcast) MoL params.
        """
        cfg = self.cfg
        x = ff_dict["x"]
        mean = ff_dict["mean_tot"]
        scale = ff_dict["scale_tot"]
        log_scale = ff_dict["log_scale_tot"]
        mel = ff_dict["mel"]
        B, L = x.shape

        rl = dist.logistic_0_1(rng, (B, num_samples, L))
        x_xp = rl * scale[:, None, :] + mean[:, None, :]

        x_scaled = self._clip_or_not(x)
        x_xp_scaled = self._clip_or_not(x_xp)

        # teacher params are a frozen separate tree (no grads taken w.r.t.
        # them); gradients DO flow through x into the teacher's graph, as in
        # the reference (parallel_wavenet.py:382-383).
        te_mol = self._teacher_out_params(teacher_params, x_scaled, mel)  # [B, L, 3*mix]
        # broadcast over the sample axis instead of tf_repeat materialization
        log_te_probs = dist.mol_log_probs(
            te_mol[:, None, :, :], x_xp_scaled, cfg.quant_chann
        )  # [B, S, L]
        H_Ps_Pt_bl = -jnp.mean(log_te_probs, axis=1)  # [B, L]

        H_Ps = jnp.mean(log_scale) + 2.0
        H_Ps_Pt = jnp.mean(H_Ps_Pt_bl)
        kl_loss = H_Ps_Pt - H_Ps
        return {"kl_loss": kl_loss, "H_Ps": H_Ps, "H_Ps_Pt": H_Ps_Pt}

    def kl_loss_gauss(self, teacher_params, ff_dict):
        """Closed-form per-step KL(N_q || N_p) + 4*mean((logσp - logσq)^2)
        (reference parallel_wavenet.py:404-428)."""
        x = ff_dict["x"]
        mean_q = ff_dict["mean_tot"]
        scale_q = ff_dict["scale_tot"]
        log_scale_q = ff_dict["log_scale_tot"]
        mel = ff_dict["mel"]

        x_scaled = self._clip_or_not(x)
        te_out = self._teacher_out_params(teacher_params, x_scaled, mel)
        mean_p, scale_p = dist.mean_std_from_out_params(te_out, use_log_scales=True)
        if self.cfg.kl_sigma_floor > 0.0:
            # ClariNet-style stabilization against over-sharp teachers
            # (config.kl_sigma_floor; 0.0 = reference-exact math)
            scale_p = jnp.maximum(scale_p, self.cfg.kl_sigma_floor)
        log_scale_p = jnp.log(scale_p)

        var_q = scale_q**2.0
        var_p = scale_p**2.0
        kl_bl = log_scale_p - log_scale_q + (var_q - var_p + (mean_p - mean_q) ** 2.0) / (
            2.0 * var_p
        )
        kl_loss = jnp.mean(kl_bl)
        reg = jnp.mean((log_scale_p - log_scale_q) ** 2.0)
        return {"kl_loss": kl_loss + 4.0 * reg}

    @staticmethod
    def _trim_to_match(a, b):
        """Center-trim the longer of two [B, L] signals to the shorter's
        length (reference parallel_wavenet.py:430-435, 464-470)."""
        la, lb = a.shape[1], b.shape[1]
        if la > lb:
            left = (la - lb) // 2
            a = jax.lax.dynamic_slice_in_dim(a, left, lb, axis=1)
        elif lb > la:
            left = (lb - la) // 2
            b = jax.lax.dynamic_slice_in_dim(b, left, la, axis=1)
        return a, b

    def stft_feat(self, stft_complex):
        """Feature map of a complex STFT for the power loss
        (reference PWNHelper.stft_feat_fn, parallel_wavenet.py:34-53)."""
        cfg = self.cfg
        y = jnp.abs(stft_complex)
        if cfg.use_mel:
            y = stft_ops.melspec_from_spec(y)
        f = cfg.spec_enhance_factor
        if f == 0:
            y = jnp.log(jnp.maximum(y, 1e-5))
        elif f == 2:
            y = y**2.0
        elif f == 3:
            rw = (lambda w: w) if cfg.use_l1_loss else np.sqrt
            y = jnp.concatenate(
                [
                    rw(0.4) * y,
                    rw(0.2) * jnp.log(jnp.maximum(y, 1e-5)),
                    rw(0.2) * y**1.2,
                    rw(0.2) * y**1.5,
                ],
                axis=0,
            )
        return y

    def power_loss(self, ff_dict, norm_stats=None):
        """|STFT| feature distance between generated and original audio
        (reference parallel_wavenet.py:459-479).  norm_stats: optional
        (mean, std) per-frequency arrays (NORM_FEAT path, :437-457)."""
        cfg = self.cfg
        pred, orig = self._trim_to_match(ff_dict["x"], ff_dict["wav"])
        pred_feat = self.stft_feat(stft_ops.stft_pad_end(pred))
        orig_feat = self.stft_feat(stft_ops.stft_pad_end(orig))
        if cfg.norm_feat and norm_stats is not None:
            mean, std = norm_stats
            pred_feat = (pred_feat - mean) / std
            orig_feat = (orig_feat - mean) / std
        if cfg.use_l1_loss:
            diff = jnp.abs(orig_feat - pred_feat)
        else:
            diff = (orig_feat - pred_feat) ** 2.0
        if cfg.effective_use_priority_freq:
            priority = jnp.mean(diff[:, :, : stft_ops.PRIORITY_FREQ])
            avg = 0.5 * jnp.mean(diff) + 0.5 * priority
        else:
            avg = jnp.mean(diff)
        return {"power_loss": avg}

    def contrastive_loss(self, teacher_params, ff_dict, rng, num_samples: int = 100):
        """Negative KL against a mismatched mel batch
        (reference parallel_wavenet.py:481-490)."""
        ff_cl = dict(ff_dict)
        ff_cl["mel"] = ff_dict["mel_rand"]
        kl = self.kl_loss_logistic(teacher_params, ff_cl, rng, num_samples)
        return {"contrastive_loss": -kl["kl_loss"]}

    def kl_and_contrastive_fused(
        self, teacher_params, ff_dict, rng_kl, rng_cl, num_samples: int = 100
    ):
        """kl_loss_logistic + contrastive_loss with ONE teacher pass.

        The reference computes the contrastive term by a second full teacher
        scoring run on (x, mel_rand) (parallel_wavenet.py:481-490 calling
        :361-402 again).  Both runs score the SAME student sample x and differ
        only in the conditioning mel, and the teacher's convs never mix batch
        entries — so stacking [mel; mel_rand] into a 2B batch and running the
        teacher (and the MoL sample broadcast) once computes identical
        quantities with one fused XLA region instead of two, and one remat
        recompute in the backward instead of two.
        """
        cfg = self.cfg
        x = ff_dict["x"]
        mean = ff_dict["mean_tot"]
        scale = ff_dict["scale_tot"]
        log_scale = ff_dict["log_scale_tot"]
        B, L = x.shape

        x_scaled = self._clip_or_not(x)
        mel_both = jnp.concatenate([ff_dict["mel"], ff_dict["mel_rand"]], axis=0)
        x_both = jnp.concatenate([x_scaled, x_scaled], axis=0)
        te_mol = self._teacher_out_params(teacher_params, x_both, mel_both)  # [2B, L, 3*mix]

        rl = jnp.concatenate(
            [
                dist.logistic_0_1(rng_kl, (B, num_samples, L)),
                dist.logistic_0_1(rng_cl, (B, num_samples, L)),
            ],
            axis=0,
        )
        scale2 = jnp.concatenate([scale, scale], axis=0)
        mean2 = jnp.concatenate([mean, mean], axis=0)
        x_xp = rl * scale2[:, None, :] + mean2[:, None, :]
        x_xp_scaled = self._clip_or_not(x_xp)

        log_te_probs = dist.mol_log_probs(
            te_mol[:, None, :, :], x_xp_scaled, cfg.quant_chann
        )  # [2B, S, L]
        H_per_batch = -jnp.mean(log_te_probs, axis=(1, 2))  # [2B]
        H_Ps_Pt = jnp.mean(H_per_batch[:B])
        H_Ps_Pt_rand = jnp.mean(H_per_batch[B:])

        H_Ps = jnp.mean(log_scale) + 2.0
        return {
            "kl_loss": H_Ps_Pt - H_Ps,
            "H_Ps": H_Ps,
            "H_Ps_Pt": H_Ps_Pt,
            "contrastive_loss": -(H_Ps_Pt_rand - H_Ps),
        }

    def calculate_loss(self, teacher_params, ff_dict, rng, norm_stats=None):
        """Assemble kl + plf*power (+ clf*contrastive)
        (reference parallel_wavenet.py:492-512).

        ff_dict: feed_forward outputs + {'mel', 'wav'} (+ 'mel_rand').
        """
        cfg = self.cfg
        if cfg.loss_type == "logistic":
            rng_kl, rng_cl = jax.random.split(rng)
            clf = cfg.contrastive_loss_factor
            if clf > 0.0:
                # fused: one 2B teacher pass scores both the matched and the
                # mismatched conditioning (see kl_and_contrastive_fused)
                loss_dict = self.kl_and_contrastive_fused(
                    teacher_params, ff_dict, rng_kl, rng_cl, cfg.num_samples
                )
            else:
                loss_dict = self.kl_loss_logistic(
                    teacher_params, ff_dict, rng_kl, cfg.num_samples
                )
        else:
            loss_dict = self.kl_loss_gauss(teacher_params, ff_dict)
            clf = 0.0
        loss = loss_dict["kl_loss"]
        if cfg.power_loss_factor > 0.0:
            pl = self.power_loss(ff_dict, norm_stats)
            loss = loss + cfg.power_loss_factor * pl["power_loss"]
            loss_dict.update(pl)
        if clf > 0.0:
            loss = loss + clf * loss_dict["contrastive_loss"]
        loss_dict["loss"] = loss
        return loss_dict


def transplant_teacher_deconv(student_params, teacher_params):
    """Initialize the student's deconv stack(s) from the teacher's trained
    deconv weights (reference train_parallel_wavenet.py:95-125, applied after
    teacher restore and data-dependent init, :205-211).

    Works for all three sharing modes: per-flow stacks, shared stack, and
    frozen teacher stack.
    """
    te_deconv = jax.tree_util.tree_map(jnp.asarray, teacher_params["deconv"])
    out = dict(student_params)
    if "deconv_share" in student_params:
        out["deconv_share"] = te_deconv
    else:
        out["flows"] = [dict(f, deconv=te_deconv) for f in student_params["flows"]]
    return out
