"""Frozen dataclass configuration tree.

Replaces the reference's three-tier yacs config (vlnce_baselines/config/default.py,
habitat_extensions/config/default.py, bash flag blocks) with a single immutable
tree. Key values mirror bert_config/{bert-base-uncased,xlm-roberta-base}/config.json
and vlnce_baselines/models/etp/vlnbert_init.py:38-59 in the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    """Cross-modal topological planner (text + pano + graph encoders).

    Mirrors the reference model hyperparameters assembled in
    vlnbert_init.py:41-59 on top of the HF BERT/XLM-R config.
    """

    # language backbone (bert-base-uncased defaults)
    vocab_size: int = 30522
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    lang_layer_norm_eps: float = 1e-12   # xlm-roberta uses 1e-5
    hidden_dropout: float = 0.1
    attn_dropout: float = 0.1
    pad_token_id: int = 0                # xlm-roberta uses 1

    # vision / fusion parts always use eps 1e-12 in the reference
    # (hardcoded in ImageEmbeddings & friends, vilmodel_cmt.py:459-478)
    vis_layer_norm_eps: float = 1e-12

    # stack depths (vlnbert_init.py:47-49)
    num_l_layers: int = 9
    num_pano_layers: int = 2
    num_x_layers: int = 4

    # feature sizes (vlnbert_init.py:41-45)
    image_feat_size: int = 512
    depth_feat_size: int = 128
    angle_feat_size: int = 4
    max_action_steps: int = 100
    use_depth_embedding: bool = True
    graph_sprels: bool = True
    # object tokens (REVERIE-style OG pretraining; dataset.py:228-247).
    # 0 disables object support entirely (ETPNav R2R/RxR path). When > 0
    # the pano token axis gains object slots with nav_type 2, so
    # num_nav_types must be 3.
    obj_feat_size: int = 0
    num_nav_types: int = 2

    # static shape buckets (TPU: fixed shapes, masked padding)
    max_txt_len: int = 80        # r2r 80, rxr 200 (IL.max_text_len)
    max_vp_len: int = 20         # [stop] + cand(<=5 after NMS) + 12 views
    max_gmap_len: int = 64       # [stop] + nodes + ghosts, bucketed
    # eval/infer-time graph-length buckets for the navigation program:
    # each step emits at the smallest bucket that fits the largest live
    # graph (measured on v5e-1 at B=8: 0.52 ms at G=16 vs 0.78 ms at
    # G=64, plus a G^2-smaller pair_dists transfer). () = always
    # max_gmap_len.
    # Training emits/scores at max_gmap_len during the rollout; the learn
    # phase may slice the record to IL.train_gmap_buckets (see ILConfig).
    # jit caches one program per bucket.
    gmap_len_buckets: Tuple[int, ...] = ()

    # per-layer jax.checkpoint on the x-layer (nav/cross-modal) scan:
    # backward saves only each layer's (B, G, D) boundary and recomputes
    # the attention internals, instead of keeping every layer's
    # (B, heads, G, L)+(B, heads, G, G) probs live — required to fit the
    # G=96 replay bucket's backward in v5e HBM (B*T=320 rows). No effect
    # on forward-only programs (rollout/serving/eval). The learn path
    # turns this on via IL.remat_nav.
    remat_scan: bool = False
    # jax.checkpoint policy name for remat_scan (an attribute of
    # jax.checkpoint_policies, e.g. "dots_with_no_batch_dims_saveable"
    # to save matmul outputs and recompute only elementwise chains).
    # None = save nothing (full per-layer recompute).
    remat_policy: Optional[str] = None

    # compute dtype for the transformer stacks
    use_bf16: bool = True
    # navigation (global graph) stack dtype override: None follows
    # use_bf16. fp32 measured FASTER at rollout scoring shapes on v5e
    # (<=1024x768 GEMMs pay bf16 casts without reaching the bf16 MXU
    # rate — tools/exp_nav_bisect.py); rollout and learn replay share
    # this flag so replay-equivalence holds whichever way it points.
    nav_use_bf16: Optional[bool] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class WaypointConfig:
    """Waypoint predictor TRM (reference: waypoint_pred/TRM_net.py:9-60)."""

    hidden_size: int = 768
    num_heads: int = 12
    num_layers: int = 2          # TRM_LAYER
    num_angles: int = 120
    num_images: int = 12
    num_distances: int = 12      # n_classes
    neighbor: int = 1            # TRM_NEIGHBOR circular attention window
    heatmap_offset: int = 5      # HEATMAP_OFFSET rotation
    hidden_dropout: float = 0.3
    attn_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    depth_feat_shape: Tuple[int, int, int] = (128, 4, 4)
    max_predictions: int = 5     # NMS slots (Policy_ViewSelection_ETP.py:235)
    nms_sigma: Tuple[float, float] = (7.0, 5.0)


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    """CLIP ViT-B/32 image tower (reference loads via clip.load('ViT-B/32'))."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    layer_norm_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class DepthEncoderConfig:
    """DD-PPO ResNet-50 depth encoder (habitat-style GroupNorm ResNet).

    Reference: models/encoders/resnet_encoders.py:13-50 wrapping
    habitat_baselines ResNetEncoder(baseplanes=32, ngroups=16, resnet50).
    Output (B, 4, 4, 128) for 128x128 depth input after the compression conv.
    """

    input_size: int = 128
    baseplanes: int = 32
    ngroups: int = 16
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    expansion: int = 4
    output_size: int = 2048     # flattened target: channels * spatial^2
    # one-pass Pallas GroupNorm(+ReLU+residual) kernel
    # (ops/pallas_groupnorm.py): stats + normalize + epilogue in a single
    # HBM read+write vs XLA's two passes. Parity-tested; adopt/reject by
    # measurement (tools/exp_gn_pallas.py).
    use_fused_gn: bool = False


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """Topological map constants (reference: models/graph_utils.py:9-10)."""

    # NOTE: the merge radius and ghost-position augmentation live in IL
    # (IL.loc_noise / IL.ghost_aug, like the reference yaml); the 30 m /
    # 10-step pos-feature normalizers are the reference's hardcoded
    # constants (graph_utils.py:9), module constants here. Only knobs
    # that actually act belong in this section.
    merge_ghost: bool = True     # MODEL.merge_ghost
    # MODEL.consume_ghost: delete a ghost once the agent moves to it
    # (iter_train.yaml MODEL.consume_ghost; rollout act-4 handling)
    consume_ghost: bool = True


@dataclasses.dataclass(frozen=True)
class ILConfig:
    """Schedule-sampling IL fine-tune knobs (run_r2r/iter_train.yaml)."""

    iters: int = 15000
    log_every: int = 200
    lr: float = 1e-5
    batch_size: int = 8          # envs per device
    max_traj_len: int = 20       # max planner steps per episode
    ml_weight: float = 1.0
    sample_ratio: float = 0.75
    decay_interval: int = 3000
    expert_policy: str = "spl"   # or 'ndtw'
    waypoint_aug: bool = True
    ghost_aug: float = 0.0
    loc_noise: float = 0.5
    back_algo: str = "teleport"  # or 'control'
    tryout: bool = True
    max_text_len: int = 80
    success_distance: float = 3.0
    stop_distance: float = 1.5   # teacher stop trigger (ss_trainer_ETP.py:283)
    # MODEL.fix_{lang,pano}_embedding: freeze the text embeddings + 9-layer
    # language encoder / the pano ImageEmbeddings during fine-tuning
    # (vilmodel_cmt.py:675-682 sets requires_grad=False; here the optimizer
    # masks those subtrees instead)
    fix_lang_embedding: bool = False
    fix_pano_embedding: bool = False
    # IL.is_requeue: auto-resume from the newest checkpoint in the ckpt
    # dir (ss_trainer_ETP.py:216-236). Off by default: silent resume from
    # a stale checkpoint of a previous experiment is worse than a flag.
    is_requeue: bool = False
    remat: bool = False          # jax.checkpoint the pano encoder in the
                                 # learn step (memory <-> recompute)
    # per-layer remat of the nav x-layer scan in the learn step's replay
    # (PlannerConfig.remat_scan). On by default: the G=96 replay bucket's
    # backward does not fit v5e HBM without it. Applied only when the
    # replayed graph axis G >= remat_nav_min_gmap: the recompute costs
    # +3.4% at G=64 (142.8 vs 138.1 ms on v5e) and the smaller buckets
    # fit HBM comfortably, so only the big bucket pays it
    # (NOTES_ROUND4.md).
    remat_nav: bool = True
    remat_nav_min_gmap: int = 80
    # PRNG implementation for the per-iteration dropout keys. "rbg" (a
    # counter-based XLA RngBitGenerator) cuts the fused learn step from
    # 147.6 to 133.2 ms on v5e-1 (tools/exp_learn_bisect.py: threefry
    # mask generation is ~16% of the step; the train=False floor is
    # 123.8 ms). Statistically equivalent for dropout; set "threefry2x32"
    # to restore JAX's default splittable generator.
    rng_impl: str = "rbg"
    # Experimental: uint8-bits dropout masks (ops/basic.py maybe_dropout;
    # tools/exp_learn_bisect.py bits8 variant). Keep probabilities
    # quantize to n/256. Recorded here (not only as the module global) so
    # a run's setting is reproducible from its config/checkpoint.
    dropout_bits8: bool = False
    # Bucketed replay (VERDICT r3 #2): before the fused learn step, slice
    # the recorded interval's trajectory axis to the smallest bucket that
    # holds the longest live episode, and the graph axis to the smallest
    # bucket that holds the largest emitted slot count. Slicing is exact
    # (slots are prefix-ordered, steps beyond the last valid one are
    # -100-teacher padding) — it removes padding compute, not data. One
    # jitted learn program per (T, G) bucket pair; keep the sets small.
    # () = always the record's full (max_traj_len, max_gmap_len) shape.
    # The reference pads ragged graphs to the *batch* max per step
    # (common/ops.py:46) — this is the fixed-shape analogue.
    train_traj_buckets: Tuple[int, ...] = ()
    train_gmap_buckets: Tuple[int, ...] = ()
    # Transport depth maps host->device as uint16 (dequantized on device
    # by agent.encode_panorama). Halves depth upload bytes; quantization
    # error <= 1/65535 on the [0,1] depth range — far below the habitat
    # depth sensor's own noise floor. Matters on rigs where the
    # accelerator sits behind a network link (e.g. the axon tunnel at
    # ~17 MB/s, where observation upload IS the rollout wall-time).
    depth_transport_uint16: bool = False
    # bf16 softmax-probs chain inside attention for bf16 stacks
    # (ops/attention.py PROBS_BF16): halves the (B,H,Lq,Lk) softmax+
    # dropout memory traffic that dominates the learn step's backward.
    # Probs are in [0,1] (~3 significant digits in bf16) — the regime
    # torch fp16 autocast trains the reference in. fp32 stacks (parity
    # tests, fp32 serving nav) are unaffected. Measured before default
    # flip via tools/exp_learn_bwd.py probs_bf16 variant.
    attn_probs_bf16: bool = False
    # Learn-phase aggregation backward variant: rebuild the dense
    # (B,T,G,T*P) aggregation matrix ON DEVICE from the sparse provenance
    # record before the replay, so d(pano tokens) is one MXU matmul
    # (einsum transpose) instead of the gather path's scatter-add. W is a
    # function of record data only — no gradient flows through its
    # construction. Costs a (B,T,G,T*P) fp32 buffer (~43 MB at r2r G=64).
    # Measured on v5e-1 (tools/exp_learn_bwd.py) before flipping.
    agg_dense_device: bool = False


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """MLM+SAP pretraining (pretrain_src/run_pt/r2r_pretrain_habitat.json)."""

    num_train_steps: int = 100_000
    warmup_steps: int = 10_000
    learning_rate: float = 5e-5
    batch_size: int = 32
    grad_norm: float = 5.0
    weight_decay: float = 0.01
    mlm_prob: float = 0.15
    # proxy tasks + multinomial mix ratios (train_datasets.tasks /
    # mix_ratio in r2r_pretrain_habitat.json; the shipped config enables
    # mlm+sap only — mrc/og are available here as working tasks, whereas
    # the reference keeps them as dormant code, pretrain_cmt.py:59-64
    # with the required local_encoder commented out, vilmodel.py:663).
    tasks: Tuple[str, ...] = ("mlm", "sap")
    task_ratios: Tuple[float, ...] = (1.0, 1.0)
    mrc_mask_prob: float = 0.15          # r2r_pretrain_habitat.json
    image_prob_size: int = 1000          # CLIP soft-label dim (dataset.py:363)
    num_objs: int = 0                    # object tokens/step for OG
    resume: bool = False                 # auto-resume newest model_step_N
    # optimizer family + schedule (optim/misc.py:26-37, optim/sched.py)
    optim: str = "adamw"   # adam | adamax | adamw | radam | ralamb | rangerlars
    lr_sched: str = "warmup_linear"      # warmup_linear | noam
    betas: Tuple[float, float] = (0.9, 0.98)   # r2r_pretrain_habitat.json
    lookahead_alpha: float = 0.5         # optim/lookahead.py:13
    lookahead_k: int = 6
    log_steps: int = 1000
    valid_steps: int = 5000
    # trajectory shape buckets
    max_traj_steps: int = 8
    views_per_step: int = 12
    # dropout-key PRNG implementation (see ILConfig.rng_impl)
    rng_impl: str = "rbg"


@dataclasses.dataclass(frozen=True)
class DaggerTaskConfig:
    """Legacy DAgger path (dagger_trainer.py:535-629; the IL.DAGGER
    section of the VLN-CE lineage)."""

    policy: str = "rec_vlnbert"  # 'rec_vlnbert' (waypoint-candidate
                                 # space) | 'cma' (low-level actions)
    iterations: int = 3          # DAGGER.iterations
    episodes_per_iter: int = 64  # DAGGER.update_size
    epochs: int = 4              # epochs per DAgger iteration
    batch_size: int = 4
    lr: float = 2.5e-4
    p: float = 0.75              # beta = p ** iteration
    max_steps: int = 60
    store_dir: str = "data/trajectories_dirs/dagger"  # lmdb_features_dir
    # released fine-tune checkpoint whose frozen CLIP/depth towers feed
    # the feature/candidate fns (models/convert.convert_full_policy);
    # '' = random init (pipeline-test mode, logged loudly)
    encoder_ckpt: str = ""
    # PREVALENT pytorch_model.bin for the rec_vlnbert policy itself
    # (models/convert.convert_rec_vlnbert); '' = random init
    policy_ckpt: str = ""
    # recurrent VLN-BERT stack depths (vlnbert_PREVALENT.py la/vl
    # layers); -1 = reuse PLANNER.num_l_layers / num_x_layers
    la_layers: int = -1
    vl_layers: int = -1


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """EVAL section (iter_train.yaml; ss_trainer_ETP.py:513-641)."""

    split: str = "val_unseen"
    episode_count: int = -1          # -1 = every episode of the split
    ckpt_path_dir: str = ""          # folder to poll (eval_loop)
    fast_eval: bool = False          # every 5th episode (ss_trainer:569)
    use_ckpt_config: bool = False


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """INFERENCE section (iter_train.yaml; ss_trainer_ETP.py:643-756)."""

    split: str = "test"
    ckpt_path: str = ""
    predictions_file: str = "predictions.json"
    format: str = ""                 # 'r2r' | 'rxr' (jsonl); '' = task_type
    episode_count: int = -1
    sample: bool = False             # sample actions instead of argmax
    use_ckpt_config: bool = False


@dataclasses.dataclass(frozen=True)
class DataPathsConfig:
    """On-disk dataset layout for the habitat production path (reference
    TASK_CONFIG/DATASET keys: run_r2r/r2r_vlnce.yaml DATASET section,
    habitat_extensions/config/default.py:120-134). '{split}' is
    interpolated like the reference's DATA_PATH."""

    task_config: str = ""        # habitat TASK yaml (BASE_TASK_CONFIG_PATH)
    data_path: str = ""          # episodes: .../{split}/{split}.json.gz
    scenes_dir: str = ""         # MP3D scene datasets (DATASET.SCENES_DIR)
    gt_path: str = ""            # ndtw gt: .../{split}/{split}_gt.json.gz
    roles: Tuple[str, ...] = ("guide",)   # RxR DATASET.ROLES
    languages: Tuple[str, ...] = ("*",)   # RxR DATASET.LANGUAGES


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. dp = data parallel, mp = model (tensor) parallel."""

    dp: int = -1                 # -1: use all remaining devices
    mp: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    task_type: str = "r2r"       # or 'rxr'
    planner: PlannerConfig = PlannerConfig()
    waypoint: WaypointConfig = WaypointConfig()
    clip: ClipConfig = ClipConfig()
    depth: DepthEncoderConfig = DepthEncoderConfig()
    graph: GraphConfig = GraphConfig()
    il: ILConfig = ILConfig()
    pretrain: PretrainConfig = PretrainConfig()
    dagger: DaggerTaskConfig = DaggerTaskConfig()
    mesh: MeshConfig = MeshConfig()
    eval: EvalConfig = EvalConfig()
    inference: InferenceConfig = InferenceConfig()
    paths: DataPathsConfig = DataPathsConfig()
    seed: int = 0
    # MODEL.pretrained_path: torch pretrain checkpoint to convert + load
    # into the planner before fine-tuning (iter_train.yaml)
    pretrained_path: str = ""
    # top-level run layout (iter_train.yaml NUM_ENVIRONMENTS + *_DIR keys)
    num_environments: int = 8
    # elastic recovery for --workers env pools: respawn crashed workers
    # and drop their episodes (env/vector.py; beyond-reference)
    restart_crashed_workers: bool = False
    # route fixed-shape observation arrays through per-worker shared
    # memory instead of the pickled worker pipe (env/shm_transport.py;
    # beyond-reference — habitat VectorEnv always pickles)
    shm_observations: bool = False
    tensorboard_dir: str = "logs/tensorboard"
    checkpoint_folder: str = "checkpoints"
    results_dir: str = "logs/eval_results"
    video_dir: str = "logs/video"


def pick_bucket(need: int, buckets, cap: int) -> int:
    """Smallest configured bucket that fits `need` (bounded by `cap`);
    `cap` when none fits. The single definition shared by the
    eval-emission path (PlannerConfig.gmap_len_buckets,
    rollout.py) and the learn-replay slicer (ILConfig.train_*_buckets,
    finetune.bucket_record) so the two sites cannot drift."""
    fits = [b for b in buckets if need <= b <= cap]
    return min(fits) if fits else cap


def r2r_config(**overrides) -> ExperimentConfig:
    """R2R-CE: bert-base-uncased text encoder (run_r2r/iter_train.yaml).

    max_gmap_len=96: tools/exp_gmap_capacity.py measured peak slot demand
    at reference episode shapes (T=20, K=5, merge+consume on) of p90=60 /
    max=66 with teacher-guided rollouts and up to 88 across settings — a
    64 cap silently evicts ghosts from ~8% of episodes (the reference
    grows unboundedly, graph_utils.py:193-257). 96 holds every measured
    episode; the learn phase pays for it only on intervals that need it
    (IL.train_gmap_buckets)."""
    planner = PlannerConfig(max_gmap_len=96,
                            gmap_len_buckets=(16, 32, 48, 64))
    il = ILConfig(train_traj_buckets=(12, 20),
                  train_gmap_buckets=(48, 64, 96),
                  # measured on v5e-1 (tools/exp_learn_bwd.py):
                  # 133.4 -> 126.4 ms at (T20, G64), 170.8 -> 158.2 at
                  # (T20, G96 remat)
                  attn_probs_bf16=True)
    cfg = ExperimentConfig(task_type="r2r", planner=planner, il=il)
    return dataclasses.replace(cfg, **overrides)


def rxr_config(**overrides) -> ExperimentConfig:
    """RxR-CE: xlm-roberta-base text encoder, longer instructions
    (run_rxr/iter_train.yaml; vlnbert_init.py:34-39 sets type_vocab_size=2)."""
    planner = PlannerConfig(
        vocab_size=250002,
        lang_layer_norm_eps=1e-5,
        pad_token_id=1,
        type_vocab_size=2,
        max_txt_len=200,
        max_gmap_len=96,                     # see r2r_config docstring
        gmap_len_buckets=(16, 32, 48, 64),
    )
    il = ILConfig(
        iters=20000, lr=1.5e-5, expert_policy="ndtw", max_text_len=200,
        train_traj_buckets=(12, 20), train_gmap_buckets=(48, 64, 96),
        attn_probs_bf16=True,        # see r2r_config
    )
    cfg = ExperimentConfig(task_type="rxr", planner=planner, il=il)
    return dataclasses.replace(cfg, **overrides)


def tiny_config(**overrides) -> ExperimentConfig:
    """Small config for tests / CI: same topology, tiny dims."""
    planner = PlannerConfig(
        vocab_size=512,
        hidden_size=64,
        num_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        num_l_layers=2,
        num_pano_layers=1,
        num_x_layers=2,
        image_feat_size=32,
        depth_feat_size=16,
        max_txt_len=16,
        max_vp_len=18,
        max_gmap_len=16,
        use_bf16=False,
    )
    waypoint = WaypointConfig(hidden_size=64, num_heads=4, num_layers=1,
                              depth_feat_shape=(16, 2, 2))
    clip = ClipConfig(image_size=32, patch_size=16, width=64, layers=2,
                      heads=4, output_dim=32)
    # input 64 -> spatial 2, compression channels 64/4 = 16 -> (2,2,16),
    # CHW-flat 64 matching waypoint depth_feat_shape (16,2,2)
    depth = DepthEncoderConfig(input_size=64, baseplanes=8, ngroups=4,
                               layers=(1, 1, 1, 1), output_size=64)
    il = ILConfig(iters=2, log_every=1, batch_size=2, max_traj_len=4,
                  max_text_len=16)
    pretrain = PretrainConfig(num_train_steps=4, warmup_steps=2, batch_size=2,
                              max_traj_steps=3, views_per_step=12)
    dagger = DaggerTaskConfig(iterations=1, episodes_per_iter=2, epochs=1,
                              batch_size=2, max_steps=4, la_layers=2,
                              vl_layers=1)
    cfg = ExperimentConfig(
        task_type="r2r", planner=planner, waypoint=waypoint, clip=clip,
        depth=depth, il=il, pretrain=pretrain, dagger=dagger,
    )
    return dataclasses.replace(cfg, **overrides)
