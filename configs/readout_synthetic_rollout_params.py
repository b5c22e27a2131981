"""Physion-style VQA readout trained on ROLLED-OUT slots — the synthetic
analog of the reference's full vp_vqa chain (docs/vp_vqa.md steps 5-7:
rollout_physion_slots -> train PhysionReadout on rollouts -> VQA sweep).

Chained off the 20.5k-step savi_ldm soak via the long3 LDMSlotFormer.

Drive order:
    python scripts/rollout_physion_slots.py \
        --params configs/ldmslotformer_synthetic_long3-res64.py \
        --weight checkpoint/ldmslotformer_synthetic_long3-res64/ckpt_final \
        --save_path checkpoint/ldmslotformer_synthetic_long3-res64/rollout_slots.pkl \
        --obs_frames 4
    python scripts/train.py --params configs/readout_synthetic_rollout_params.py
    python scripts/test_physion_vqa.py \
        --params configs/readout_synthetic_rollout_params.py \
        --weight 'checkpoint/readout_synthetic_rollout_params/ckpt_*'
"""

from slotdiffusion_tpu.utils import BaseParams


class SlotAttentionParams(BaseParams):
    project = "SlotDiffusionTPU"

    max_epochs = 20
    save_interval = 1.0
    eval_interval = 2
    save_epoch_end = False
    print_iter = 10

    optimizer = "Adam"
    lr = 1e-3
    weight_decay = 0.0
    clip_grad = -1
    warmup_steps_pct = 0.0

    dataset = "synthetic_rollout_slots"
    data_root = ""
    rollout_root = ("checkpoint/ldmslotformer_synthetic_long3-res64/"
                    "rollout_slots.pkl")
    # MUST equal the max_objects the source synthetic videos were rendered
    # with (the chained savi_ldm config): the VQA label is re-derived from
    # the renderer's RNG at that setting. builders.py validates this
    # against the rollout pkl's _meta at load time.
    max_objects = 4
    train_batch_size = 32
    val_batch_size = 32
    num_workers = 2

    model = "PhysionReadout"
    resolution = (64, 64)
    slot_size = 64
    num_slots = 6
    readout_dict = dict(
        num_slots=num_slots,
        slot_size=slot_size,
        agg_func="max",
        feats_dim=slot_size,
    )
    vqa_loss_w = 1.0
