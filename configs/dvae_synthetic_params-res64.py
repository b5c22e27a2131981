"""dVAE tokenizer stage-1 on synthetic video frames, 64x64 — smoke config
for the STEVE/SLATE token pipelines (no data needed); mirrors
dvae_movie_params-res128.py at toy scale (single-frame training,
gumbel tau cosine annealing)."""

from slotdiffusion_tpu.utils import BaseParams


class SlotAttentionParams(BaseParams):
    project = "SlotDiffusionTPU"

    max_epochs = 2
    save_interval = 1.0
    eval_interval = 1
    save_epoch_end = False
    print_iter = 10

    optimizer = "Adam"
    lr = 1e-3
    weight_decay = 0.0
    clip_grad = -1
    warmup_steps_pct = 0.05

    dataset = "synthetic_video"
    data_root = ""
    train_samples = 128
    val_samples = 16
    max_objects = 4
    n_sample_frames = 1  # single frames (dvae_movie_params-res128.py)
    frame_offset = 1
    video_len = 6
    load_mask = False
    train_batch_size = 16
    val_batch_size = 16
    num_workers = 2

    model = "dVAE"
    resolution = (64, 64)
    vocab_size = 512
    dvae_dict = dict(down_factor=4, vocab_size=vocab_size)

    # gumbel tau cosine annealing (video_based/method.py:549-567)
    init_tau = 1.0
    final_tau = 0.1
    tau_decay_pct = 0.3

    recon_loss_w = 1.0
