"""Frozen configuration dataclasses, one per BASELINE.json capability config.

The five configs (C1–C5) come verbatim from BASELINE.json ``configs``; the
reference repo's own config module was unreadable (SURVEY.md §0.1), so field
names here are this framework's canonical vocabulary, documented in
midi/SEMANTICS.md and tests/oracle/.

All configs are hashable frozen dataclasses so they can be closed over by
``jax.jit`` as static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class MidiSpec:
    """Piano-roll tensorization semantics (midi/SEMANTICS.md)."""

    steps_per_quarter: int = 24          # grid resolution
    quarters_per_bar: int = 4            # whole quarters per bar (0 when
    #                                      the meter isn't a whole number
    #                                      of quarters — see bar_steps)
    # The bar TENSOR length in grid steps. 0 (default) derives it as
    # steps_per_quarter * quarters_per_bar (96 on the 4/4 default); a
    # meter whose bar is not a whole number of quarters (7/8 = 3.5)
    # sets it explicitly (config.meter_grid: 7/8 → 84 steps at the
    # native 24-step/quarter resolution). Models compile for
    # [steps_per_bar, num_pitches]; the decoder heads ceil-pad-crop so
    # any bar length works (models/layers.py).
    bar_steps: int = 0
    # The DECLARED meter, carried through cache → checkpoint → export so
    # a 6/8 corpus exports 6/8 files (not the grid-equivalent "3/4").
    # 0/0 (default) falls back to quarters_per_bar/4 — the pre-round-5
    # behavior, so restored old checkpoints keep their meter. Use the
    # ``meter`` property, never these fields directly.
    meter_numerator: int = 0
    meter_denominator: int = 0
    num_pitches: int = 128               # full MIDI pitch axis
    pitch_lo: int = 0                    # crop [lo, hi) — loss-masked region
    pitch_hi: int = 128
    binarize_threshold: float = 0.5      # generation-time Bernoulli threshold
    velocity: int = 100                  # writer: velocity for emitted notes
    tempo_bpm: float = 120.0             # writer: fixed tempo
    # Ingestion cap: max notes per MIDI file (fixed-shape padded event
    # tensors need a bound; dense classical piano pieces can exceed the
    # default — CLI `--max-events` raises it per run).
    max_events: int = 4096
    # A file whose declared time signature (0x58 meta) implies a bar
    # length ≠ steps_per_bar is a hard SMFError by default — silent 4/4
    # chunking of a 3/4 corpus produces wrong bar boundaries everywhere.
    # True forces config-meter chunking anyway (CLI
    # `--ignore-time-signature`). SEMANTICS.md §1.
    ignore_time_signature: bool = False

    @property
    def steps_per_bar(self) -> int:
        return self.bar_steps or \
            self.steps_per_quarter * self.quarters_per_bar  # 96 on 4/4

    @property
    def meter(self) -> Tuple[int, int]:
        """The declared time signature (numerator, denominator) — what
        exports write into the 0x58 meta and `describe` reports. Falls
        back to quarters_per_bar/4 for specs/checkpoints predating the
        explicit meter fields."""
        if self.meter_numerator > 0 and self.meter_denominator > 0:
            return (self.meter_numerator, self.meter_denominator)
        return (self.quarters_per_bar, 4)

    @property
    def cropped_pitches(self) -> int:
        return self.pitch_hi - self.pitch_lo


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Architecture hyperparameters shared across the VAE family."""

    kind: str = "conv_bar"               # conv_bar | gru_seq | hier | cond
    z_dim: int = 64                      # bar-level latent
    z_phrase_dim: int = 256              # phrase-level latent (hier only)
    enc_channels: Tuple[int, ...] = (16, 32, 64, 128, 128)
    dec_channels: Tuple[int, ...] = (128, 128, 64, 32, 16)
    # Conv stem/head family. "conv": the parity pyramid (reference
    # behavior, torch-convertible). "patch": the TPU-first MXU layout —
    # space-to-depth patchify the [96,128] bar into patch_size patches
    # (pt·pp input channels), wide-channel stack, and a depth-to-space
    # decoder head instead of the 16→1-channel deconv. The round-3 MFU
    # attribution pinned the parity stem's 1-channel first conv and
    # 16→1 head (contractions 9/144 vs 128×128 MXU tiles) as the
    # utilization ceiling; "patch" is the redesign that removes it
    # (models/layers.py PatchTrunk/PatchHead, measured in BASELINE.md).
    # With stem="patch", enc_channels = the patch-stack widths (first
    # layer stride 1, rest stride 2) and dec_channels its mirror.
    stem: str = "conv"
    patch_size: Tuple[int, int] = (8, 16)
    bar_feat_dim: int = 256              # per-bar feature vector (GRU input)
    gru_hidden: int = 256                # sequence/conductor GRU width
    # Temporal core over the bar axis. "gru": the parity recurrence
    # (reference behavior, torch-convertible). "attn": the non-recurrent
    # TPU-first core (models/layers.py AttnStack) — teacher-forced decode
    # runs ALL bars through batched causal-attention matmuls (no scan;
    # the GRU scans are the patch family's measured MFU ceiling,
    # docs/PALLAS_NOTES.md round 4), and generation scans an O(1)/bar
    # KV-cache step. gru_hidden doubles as the attention width. Supported
    # for kinds gru_seq, cond, and hier (conv_bar has no temporal core).
    # Under kind="hier" there is no separate conductor GRU: z_phrase
    # joins the attention input per bar and the causal stack plays both
    # roles — the 16-bar teacher-forced train step then has NO scan at
    # all (models/vae.py BarDecoder.setup conductor note).
    temporal: str = "gru"
    attn_layers: int = 2                 # transformer depth (temporal="attn")
    attn_heads: int = 4                  # attention heads
    # learned-position table length = the longest window/sweep an attn
    # model can see; raising it only grows params by 1 row x gru_hidden
    attn_max_bars: int = 128
    num_bars: int = 1                    # bars per training example
    cond_chord_classes: int = 24         # 12 roots x {maj, min}
    cond_key_classes: int = 24
    cond_embed_dim: int = 16
    use_prev_bar: bool = True            # decoder conditions on previous bar
    dtype: str = "bfloat16"              # compute dtype (params stay fp32)
    # Decoder-head logits dtype. The head materializes [B,N,96,128] —
    # the largest activation in the train step; emitting it bf16 halves
    # its HBM write+read while the loss still accumulates in f32
    # (ops/losses.bce_with_logits upcasts inside the fused reduction).
    # float32 preserves exact round-2 numerics; see BASELINE.md for the
    # measured A/B on chip.
    logits_dtype: str = "float32"
    # First encoder conv via the banded-MXU Pallas kernel
    # (ops/conv1_pallas.py) instead of XLA's conv emitter; checkpoint
    # layout is identical either way. See BASELINE.md utilization notes
    # for the measured A/B.
    use_pallas_conv1: bool = False


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    batch_size: int = 16
    learning_rate: float = 1e-3
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    # Dtype of Adam's FIRST-moment accumulator (optax mu_dtype). The
    # round-4 trace attribution pins part of the MXU family's non-matmul
    # remainder on optimizer/elementwise passes over the parameter-sized
    # buffers; "bfloat16" halves the m-buffer's HBM traffic (and its
    # checkpoint footprint) at the cost of moment precision — measured
    # +2.3% steps/s on c2_mxu (36.2->37.0% MFU, logs/r5/
    # mxu_levers.jsonl; docs/PALLAS_NOTES.md round-5 lever table).
    # Default stays f32 so r4 training numerics are bit-preserved;
    # flip per-run via bench/ab_step.py --adam-mu-dtype bfloat16.
    # The second moment stays f32 (optax has no nu dtype knob, and
    # v's dynamic range is the fragile one anyway).
    adam_mu_dtype: str = "float32"
    weight_decay: float = 0.0
    grad_clip_norm: float = 0.0          # 0 disables
    # KL annealing (ops/losses.beta_schedule): "linear" ramps 0 -> beta_max
    # over warmup steps after beta_hold_steps at 0; "cyclical" repeats the
    # ramp every beta_cycle_steps (posterior-collapse mitigation).
    beta_schedule: str = "linear"
    beta_max: float = 1.0
    beta_warmup_steps: int = 2000
    beta_hold_steps: int = 0
    beta_cycle_steps: int = 0
    # Free-bits KL floor (nats per latent dimension, ops/losses.kl_free_bits):
    # the training objective floors each dimension's batch-mean KL at this
    # value, the standard posterior-collapse guard in the MusicVAE lineage.
    # 0 disables (reference behavior: plain KL-annealed ELBO). Eval and the
    # reported `kl` metric always use the true un-floored KL.
    free_bits: float = 0.0
    # Learning-rate schedule: "constant" (reference behavior: fixed Adam lr)
    # or "cosine" — optional linear warmup over lr_warmup_steps, then cosine
    # decay from learning_rate to learning_rate*lr_min_ratio at num_steps.
    # The schedule is a pure function of the optimizer's step count, so
    # checkpoint resume continues it exactly.
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    lr_min_ratio: float = 0.0
    # Exponential-moving-average weights (0 disables — reference
    # behavior). When > 0 (e.g. 0.999) the train step maintains
    # ema = decay*ema + (1-decay)*params in TrainState (checkpointed, so
    # resume is bit-exact); generate/eval-gen can sample from the
    # smoothed weights via --ema. EMA-off states keep the exact old
    # pytree structure (the field is an empty None node).
    ema_decay: float = 0.0
    num_steps: int = 10000
    log_every: int = 100
    ckpt_every: int = 1000
    ckpt_keep: int = 3
    # periodic held-out eval inside train() (SURVEY §2.1 #10 "periodic eval
    # recon"): every eval_every steps score eval_batches batches of the
    # holdout split; the best-by-eval-loss state is checkpointed separately.
    # 0 disables (the round-1 behavior).
    eval_every: int = 0
    eval_batches: int = 4
    holdout_frac: float = 0.1
    seed: int = 0
    # transpose augmentation (ops/augment.py): uniform per-example pitch
    # shift in [-K, +K] semitones, applied on device inside the train
    # step; cond models rotate chord/key labels with the shift. 0 = off
    # (reference behavior).
    transpose_aug: int = 0
    # resident-corpus device layout: "replicated" uploads the uint8 bar
    # cache to every device (corpora ≪ HBM, the default); "sharded"
    # partitions it piece-wise over the 'data' mesh axis — each device
    # holds 1/D of the corpus and gathers batch rows from its LOCAL shard
    # via shard_map (train/sharded_corpus.py), extending fully-resident
    # training to corpora up to D× one device's HBM.
    corpus_layout: str = "replicated"
    remat_encoder: bool = False          # jax.checkpoint on per-bar encoder
    # Pallas loss kernel in the TRAIN step — DEFAULT ON since round 4:
    # the dual-output forward (ops/fused_elbo.py) emits the BCE gradient
    # tile alongside the sum, so the VJP is one fused scale instead of a
    # fusion-barriered second pass, measured +8–14% full-step steps/s on
    # every bf16 config (docs/PALLAS_NOTES.md round-4 table; numerics
    # ≤1e-5 rel fwd / ≤1e-6 grads). Ignored off-TPU (jnp fallback). Set
    # False to force XLA autodiff end to end (the round-1–3 behavior).
    use_pallas_loss: bool = True


@dataclasses.dataclass(frozen=True)
class GenSpec:
    num_bars: int = 4                    # autoregressive generation length
    num_samples: int = 1                 # batched sweep width
    interpolate: bool = False            # slerp z_a -> z_b over num_bars
    temperature: float = 1.0             # latent-space z scale
    # bar output: "threshold" = deterministic binarize at
    # midi.binarize_threshold (reference behavior); "bernoulli" =
    # stochastic per-cell Bernoulli(sigmoid(logits/sample_temperature))
    sample_mode: str = "threshold"
    sample_temperature: float = 1.0


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Device-mesh axes. data = batch sharding (primary), model = optional
    tensor-parallel axis for large decoders (demonstration axis, off = 1)."""

    data: int = 1
    model: int = 1

    @property
    def axis_names(self) -> Tuple[str, str]:
        return ("data", "model")


@dataclasses.dataclass(frozen=True)
class Config:
    name: str = "c1_conv_bar"
    midi: MidiSpec = dataclasses.field(default_factory=MidiSpec)
    model: ModelSpec = dataclasses.field(default_factory=ModelSpec)
    train: TrainSpec = dataclasses.field(default_factory=TrainSpec)
    gen: GenSpec = dataclasses.field(default_factory=GenSpec)
    mesh: MeshSpec = dataclasses.field(default_factory=MeshSpec)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# --- The five BASELINE.json configs -----------------------------------------

# C1: "Single-bar piano-roll conv VAE (~1M params, 96x128 roll), batch 16,
#      CPU fp32 — ELBO train + reconstruct"
C1_CONV_BAR = Config(
    name="c1_conv_bar",
    model=ModelSpec(kind="conv_bar", num_bars=1, use_prev_bar=False,
                    dtype="float32"),
    train=TrainSpec(batch_size=16),
)

# C2: "4-bar GRU sequence VAE with KL annealing, batch 64, synthetic MIDI corpus"
C2_GRU_4BAR = Config(
    name="c2_gru_4bar",
    model=ModelSpec(kind="gru_seq", num_bars=4, z_dim=128),
    train=TrainSpec(batch_size=64, beta_warmup_steps=4000),
)

# C3: "Hierarchical bar→phrase VAE, teacher-forced decoder, 16-bar context,
#      batch 128"
# remat_encoder off by default: at batch 128 x 16 bars the encoder
# activations fit v5e HBM with room to spare, and the recompute costs
# measured throughput (47.4 -> 50.3 steps/s without it, bench/mfu.py A/B).
# Flip it back on for contexts that outgrow HBM.
C3_HIER_16BAR = Config(
    name="c3_hier_16bar",
    model=ModelSpec(kind="hier", num_bars=16, z_dim=64, z_phrase_dim=256),
    train=TrainSpec(batch_size=128, remat_encoder=False),
)

# C4: "Conditional VAE (chord/key conditioning) + binarized sampling,
#      batch 256 on v4-8"
C4_COND = Config(
    name="c4_cond",
    model=ModelSpec(kind="cond", num_bars=4, z_dim=128),
    train=TrainSpec(batch_size=256),
    mesh=MeshSpec(data=8),
)

# C5: "64-bar autoregressive generation with latent interpolation, batched
#      1k-sample sweep on v5e-8"
C5_GEN_SWEEP = Config(
    name="c5_gen_sweep",
    model=ModelSpec(kind="gru_seq", num_bars=4, z_dim=128),
    gen=GenSpec(num_bars=64, num_samples=1024, interpolate=True),
    mesh=MeshSpec(data=8),
)

# Pitch-range crop driven end-to-end (BASELINE north_star "pitch-range
# crop" pipeline stage): C2's seq-VAE restricted to the 84-key playing
# range [24, 108). The crop is a mask, not a slice — rolls stay 128 wide
# (lane-aligned), the loss ignores out-of-range cells (ops/losses.py via
# tensorize.pitch_mask) and generation zeroes them (models _binarize).
C2_CROPPED = Config(
    name="c2_cropped",
    midi=MidiSpec(pitch_lo=24, pitch_hi=108),
    model=ModelSpec(kind="gru_seq", num_bars=4, z_dim=128),
    train=TrainSpec(batch_size=64, beta_warmup_steps=4000),
)

# TPU-first MXU variant of C2 (beyond-reference, round-4): the parity
# architecture is pinned at 13–15% MFU by its own channel shapes
# (BASELINE.md utilization notes); this config swaps in the patch
# stem/head (ModelSpec.stem docstring) with every contraction ≥ 1152 and
# every width a multiple of 128. Same training pipeline, loss, latent
# core, generation scan, and corpus; larger capacity (the point is to
# FILL the chip). Quality parity vs c2_gru_4bar at equal step budget +
# the measured MFU live in BASELINE.md.
C2_MXU = Config(
    name="c2_mxu",
    model=ModelSpec(kind="gru_seq", num_bars=4, z_dim=128,
                    stem="patch", patch_size=(8, 16),
                    enc_channels=(256, 256, 512),
                    dec_channels=(512, 256, 256),
                    bar_feat_dim=256, gru_hidden=512),
    # free_bits + transpose_aug on by default here — both measured
    # necessary for this capacity (logs/r4/): without the floor the wide
    # patch decoder ignores z entirely (KL collapsed to 0.3 nats, eval F1
    # halved); without augmentation the 12M params overfit the corpus
    # (eval recon 920→2853 over 8k steps). With both, c2_mxu BEATS
    # c2_gru_4bar under identical knobs (eval F1 0.795 vs 0.789, eval
    # loss 834 vs 878 at 8k steps — BASELINE.md round 4). The parity
    # configs keep the reference's plain annealed ELBO.
    train=TrainSpec(batch_size=64, beta_warmup_steps=4000,
                    free_bits=0.125, transpose_aug=5),
)

# The non-recurrent sibling of c2_mxu (beyond-reference, round-4 second
# wave): same patch stem/head and capacity, but the bar-axis GRU replaced
# by the causal-attention core (ModelSpec.temporal docstring). The GRU
# scans are the patch family's measured MFU ceiling (PALLAS_NOTES round
# 4); with attention the teacher-forced train step has NO scan at all —
# every op is a batched MXU matmul. Same pipeline/loss/latent/generation
# surface. Measured verdict (BASELINE.md round 5): at the 4-bar flagship
# shape it trails c2_mxu (31% vs 35% MFU — the window is too short for
# attention to amortize); the family pays at 16+ bars (see c2_trf_16bar).
C2_TRF = Config(
    name="c2_trf",
    model=ModelSpec(kind="gru_seq", num_bars=4, z_dim=128,
                    stem="patch", patch_size=(8, 16),
                    enc_channels=(256, 256, 512),
                    dec_channels=(512, 256, 256),
                    bar_feat_dim=256, gru_hidden=512,
                    temporal="attn", attn_layers=2, attn_heads=8),
    # same regularization as c2_mxu (KL floor + augmentation, rationale
    # in the c2_mxu comment above) PLUS standard transformer hygiene:
    # grad-clip 1.0, 1000-step lr warmup, cosine decay. Measured to
    # matter (round-5 quality soaks, logs/r5/): at GRU-tuned knobs the
    # 16-bar attn model DIVERGES (grad norms ~1e4, eval F1 oscillating
    # 0.37-0.62); with these knobs it beats the mxu sibling at matched
    # budget (F1 0.778 vs 0.731; BASELINE.md round-5 quality table).
    train=TrainSpec(batch_size=64, beta_warmup_steps=4000,
                    free_bits=0.125, transpose_aug=5,
                    grad_clip_norm=1.0, lr_schedule="cosine",
                    lr_warmup_steps=1000, lr_min_ratio=0.1),
)

# The hierarchical sibling of c2_mxu: the same patch stem/head under the
# C3 bar→phrase architecture (16-bar context, teacher-forced conductor).
# Same rationale and defaults as c2_mxu; measured MFU/quality rows in
# BASELINE.md round 4.
C3_MXU = Config(
    name="c3_mxu",
    model=ModelSpec(kind="hier", num_bars=16, z_dim=64, z_phrase_dim=256,
                    stem="patch", patch_size=(8, 16),
                    enc_channels=(256, 256, 512),
                    dec_channels=(512, 256, 256),
                    bar_feat_dim=256, gru_hidden=512),
    train=TrainSpec(batch_size=128, free_bits=0.125, transpose_aug=5),
)

# hier + attn (round 5): c3_mxu with the attention temporal core — no
# seq GRU, no conductor GRU (z_phrase rides the attention input;
# ModelSpec.temporal docstring). The 16-bar teacher-forced hierarchical
# family is exactly where the bar-axis scans dominate (PALLAS_NOTES
# round-4 pins c3_mxu's ceiling on them); this config is the experiment
# at that shape. Measured MFU/quality verdict in BASELINE.md round 5.
C3_TRF = Config(
    name="c3_trf",
    model=ModelSpec(kind="hier", num_bars=16, z_dim=64, z_phrase_dim=256,
                    stem="patch", patch_size=(8, 16),
                    enc_channels=(256, 256, 512),
                    dec_channels=(512, 256, 256),
                    bar_feat_dim=256, gru_hidden=512,
                    temporal="attn", attn_layers=2, attn_heads=8),
    # transformer hygiene knobs (C2_TRF comment): at GRU knobs this
    # config is stable but trails c3_mxu (eval F1 0.807 vs 0.831 at the
    # 8k matched budget); with clip+warmup it posts F1 0.980-0.982 —
    # the decisive quality result of the round-5 A/B (BASELINE.md).
    # lr stays CONSTANT after warmup (lr_min_ratio=1.0), unlike the
    # flat trf configs: both variants were soaked, and while decay adds
    # +0.002 recon F1, it lowers late KL usage and halves generation
    # density (4.7 vs 10.2 notes/bar, 50% vs 0% empty bars —
    # logs/r5/evalgen_c3_trf_{default,knobs}.json); this is a
    # generative model, so the denser-sampling knob wins. The flat
    # configs NEED decay for stability; this one never did.
    train=TrainSpec(batch_size=128, free_bits=0.125, transpose_aug=5,
                    grad_clip_norm=1.0, lr_schedule="cosine",
                    lr_warmup_steps=1000, lr_min_ratio=1.0),
)

# The registered long-context A/B pair (round 5, promoted from the
# round-4 ad-hoc bench configs so users can reproduce the temporal-core
# comparison by name): the c2_mxu/c2_trf architectures at 16-bar
# windows, batch 32 — constant 512 bar-images/step. The attention
# core's premise is that its advantage grows with window length (the
# GRU scan serializes N bars; attention batches them); these are the
# shapes where that is tested. Measured rows in BASELINE.md round 5.
C2_MXU_16BAR = C2_MXU.replace(
    name="c2_mxu_16bar",
    model=dataclasses.replace(C2_MXU.model, num_bars=16),
    train=dataclasses.replace(C2_MXU.train, batch_size=32),
)
C2_TRF_16BAR = C2_TRF.replace(
    name="c2_trf_16bar",
    model=dataclasses.replace(C2_TRF.model, num_bars=16),
    train=dataclasses.replace(C2_TRF.train, batch_size=32),
)
# ... and the 32-bar point (batch 16, same 512 bar-images/step).
C2_MXU_32BAR = C2_MXU.replace(
    name="c2_mxu_32bar",
    model=dataclasses.replace(C2_MXU.model, num_bars=32),
    train=dataclasses.replace(C2_MXU.train, batch_size=16),
)
C2_TRF_32BAR = C2_TRF.replace(
    name="c2_trf_32bar",
    model=dataclasses.replace(C2_TRF.model, num_bars=32),
    train=dataclasses.replace(C2_TRF.train, batch_size=16),
)

# The round-5 MXU-ceiling winner (VERDICT r4 #8; PALLAS_NOTES round-5
# lever table): the 3-layer 256/256/512 patch stack collapsed into TWO
# 512-wide layers — every conv a bigger, squarer MXU contraction.
# Measured on chip: 49.0% MFU at 227 steps/s (vs c2_mxu's 36.2% /
# 404) — 2.4x the FLOPs/step — AND better quality at matched step
# budget on a shared corpus (eval F1 0.788 vs 0.713, eval loss 903 vs
# 1268, logs/r5/wide_*_soak.log; the base config's F1 peaks by step
# 2000 and declines, so matched wall-clock does not rescue it).
C2_MXU_WIDE = C2_MXU.replace(
    name="c2_mxu_wide",
    model=dataclasses.replace(C2_MXU.model,
                              enc_channels=(512, 512),
                              dec_channels=(512, 512)),
)

_CONFIGS = {c.name: c for c in
            (C1_CONV_BAR, C2_GRU_4BAR, C3_HIER_16BAR, C4_COND, C5_GEN_SWEEP,
             C2_CROPPED, C2_MXU, C2_TRF, C3_MXU, C3_TRF,
             C2_MXU_16BAR, C2_TRF_16BAR, C2_MXU_32BAR, C2_TRF_32BAR,
             C2_MXU_WIDE)}


# native grid resolution: 24 steps/quarter = 96 steps/whole-note — the
# 4/4 default bar, and the resolution bar-adapting meters keep
_NATIVE_SPQ = 24


def meter_grid(numerator: int, denominator: int,
               steps_per_bar: int = 96) -> dict:
    """MidiSpec overrides realizing the meter ``numerator/denominator``
    (keys: steps_per_quarter, quarters_per_bar, bar_steps,
    meter_numerator, meter_denominator). SEMANTICS.md §1.

    Shape-preserving when possible: a meter spanning a whole number of
    quarters that divides ``steps_per_bar`` keeps the bar TENSOR at
    ``steps_per_bar`` steps and adapts the grid RESOLUTION instead —
    3/4 → three 32-step quarters per 96-step bar (models compiled for
    [96, 128] serve a waltz corpus unchanged).

    Otherwise the BAR LENGTH adapts at the native 24-step/quarter
    resolution (round 5): 5/4 → 120-step bars (24 × 5 quarters),
    7/8 → 84-step bars (bar_steps override; 3.5 quarters is not a whole
    number, so quarters_per_bar is 0 and exports/validation go through
    the meter fields). Models then compile for [bar_steps, 128] — the
    conv/patch heads ceil-pad-crop to any bar length. Raises ValueError
    only for meters the integer grid cannot represent (denominator not
    a power of two, or bar length not a whole number of steps)."""
    if numerator <= 0 or denominator <= 0 or \
            denominator & (denominator - 1):
        raise ValueError(f"bad meter {numerator}/{denominator} "
                         "(denominator must be a power of two)")
    if (4 * numerator) % denominator == 0:
        qpb = 4 * numerator // denominator
        if steps_per_bar % qpb == 0:
            # shape-preserving: resolution adapts, bar stays
            return dict(steps_per_quarter=steps_per_bar // qpb,
                        quarters_per_bar=qpb, bar_steps=0,
                        meter_numerator=numerator,
                        meter_denominator=denominator)
        # whole quarters that don't divide the default bar (5/4, 7/4):
        # bar adapts at native resolution — 5/4 → 24 × 5 = 120 steps
        return dict(steps_per_quarter=_NATIVE_SPQ, quarters_per_bar=qpb,
                    bar_steps=0, meter_numerator=numerator,
                    meter_denominator=denominator)
    # fractional quarters (7/8 = 3.5): bar = 4·spq·num/den grid steps
    spb4 = 4 * _NATIVE_SPQ * numerator
    if spb4 % denominator:
        raise ValueError(
            f"meter {numerator}/{denominator} is "
            f"{spb4 / denominator:g} grid steps per bar at "
            f"{_NATIVE_SPQ} steps/quarter — not a whole number; "
            f"unsupported")
    return dict(steps_per_quarter=_NATIVE_SPQ, quarters_per_bar=0,
                bar_steps=spb4 // denominator,
                meter_numerator=numerator, meter_denominator=denominator)


def get_config(name: str) -> Config:
    """Look up one of the five canonical configs by name."""
    try:
        return _CONFIGS[name]
    except KeyError:
        raise KeyError(
            f"unknown config {name!r}; available: {sorted(_CONFIGS)}") from None


def all_config_names() -> Tuple[str, ...]:
    return tuple(sorted(_CONFIGS))
