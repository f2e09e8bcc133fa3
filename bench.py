"""Benchmark harness: training throughput (headline) + single-frame inference latency.

Protocol mirrors the reference's bench machinery with the staleness fixed
(scripts/timing.py:12-46 — 100-trial compiled forward latency; plus the training
throughput the reference never measured, BASELINE.md):

  * training: flagship NCameraCNN (ResNet-50, bf16) full train step — u8->f32,
    on-device augmentation, forward, geodesic loss, backward, clipped Adam — on one
    chip; images/sec counts CAMERA images (2 per example), the unit implied by the
    reference's input pipeline accounting.
  * inference: jitted (1, 256, 256, 6) forward + se3_exp, p50 of 100 trials.

Baseline: the reference publishes no numbers (BASELINE.md). `vs_baseline` divides by
an estimated 1000 camera-images/sec for the torch reference on A100 (input-bound at
batch 32 per argus/train.py:64; A100 ResNet-50-training ceilings are far higher, so
this is a *generous* estimate of the reference's actual pipeline). The estimate is
labeled as such in the JSON (`baseline_is_estimate`).

Hardware-truth accounting (VERDICT r1 #8): the extras carry `mfu` (model flops vs
197 TFLOP/s bf16 peak) and `hbm_util` (XLA cost-analysis bytes vs 819 GB/s peak) so
progress is tracked against the v5e roofline, not a fiction. Round-2 finding: the
step runs at ~90% of its HBM-bytes roofline (105.6 GB/step), i.e. the remaining
headroom is in program bytes, not kernel tuning (docs/ROUND2_NOTES.md). Under the
fused Pallas backbone (round 3+) the XLA cost analysis sees only the
augmentation/optimizer residue, so `mfu` switches to an architecture-derived FLOP
count and `hbm_util`/`step_gb` report null — no honest bytes number exists.

Round 4: the headline configuration is FULL BACKPROP (frozen BN + frozen stem,
frozen_stages=0) — the transfer-shifted accuracy A/B (ACCURACY_r04.json) does
not support round 3's stage-freezing default (see bench-body comments +
docs/ROUND4_NOTES.md). The same JSON also carries: the k=3 frozen-fine-tune
step (`frozen_finetune_k3`, labeled with its accuracy caveat), batched-serving
throughput (`serving`, fused-bf16-frozen forward), and the device-resident
whole-epoch-on-chip e2e number (`e2e.resident_images_per_sec`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

import numpy as np


BASELINE_IMAGES_PER_SEC = 1000.0  # estimated reference A100 throughput (see docstring)


def _analytic_step_flops(n_images, hw, stem_frozen=False, stem_grad_stride=1, frozen_stages=0):
    """Training-step FLOPs of the flagship ResNet-50 backbone from the
    architecture. Needed because the fused backbone is Pallas custom calls,
    which XLA's cost analysis scores as ~0 FLOPs — the compiled-program count
    silently dropped to the augmentation+optimizer residue once fusion became
    the default. Convs: fwd x3 for fwd+dgrad+wgrad, stem x2 (images carry no
    gradient). Head/loss/augment are <1% and ignored. Cross-check: at 256x256
    this gives 8.12e12 for 256 images vs 7.93e12 measured by XLA cost analysis
    on the unfused round-2 step (within 2.5%; MFU 0.39 at 103.3 ms, BENCH_r02)."""
    H, W = hw
    stem_fwd = (H // 2) * (W // 2) * 49 * 3 * 64 * 2
    # stem backward = wgrad only (images carry no gradient), possibly frozen
    # or batch-subsampled by stem_grad_stride
    stem_off = stem_frozen or frozen_stages >= 1
    total = stem_fwd * (1 + (0 if stem_off else 1.0 / stem_grad_stride))
    cin = 64
    r = (H // 4) * (W // 4)
    for s, (k, F) in enumerate([(3, 64), (4, 128), (6, 256), (3, 512)]):
        cout = 4 * F
        r_out = r if s == 0 else r // 4
        # projection entry (stride on the 3x3, torchvision v1.5) + identity blocks
        proj_fwd = 2 * (r * cin * F + r_out * 9 * F * F + r_out * F * cout + r_out * cin * cout)
        id_fwd = 2 * (k - 1) * (r_out * cout * F + r_out * 9 * F * F + r_out * F * cout)
        # frozen stages run forward-only (models/resnet.py frozen_stages)
        total += (1 if s < frozen_stages else 3) * (proj_fwd + id_fwd)
        cin, r = cout, r_out
    return float(total) * n_images


def _analytic_kp_flops(n_images, hw, stem_frozen=False, heatmap_stride=8, head_features=128):
    """Training-step FLOPs of the keypoint family (resnet18 BasicBlock encoder +
    resize-conv upsampling head, models/keypoint_net.py). Same counting rules as
    `_analytic_step_flops`: convs x3 for fwd+dgrad+wgrad, stem x2 (images carry
    no gradient) or x1 frozen; soft-argmax/loss/PnP are <0.5% and ignored."""
    H, W = hw
    stem_fwd = (H // 2) * (W // 2) * 49 * 3 * 64 * 2
    total = stem_fwd * (1 if stem_frozen else 2)
    cin = 64
    r = (H // 4) * (W // 4)
    for s, c in enumerate([64, 128, 256, 512]):
        r_out = r if s == 0 else r // 4
        # entry block: conv1 (stride 2 off stage 0) + conv2 + 1x1 downsample
        entry = r_out * 9 * cin * c * 2 + r_out * 9 * c * c * 2
        if s > 0:
            entry += r_out * cin * c * 2
        # second block: two 3x3 convs at c
        second = 2 * r_out * 9 * c * c * 2
        total += 3 * (entry + second)
        cin, r = c, r_out
    # upsampling head: stride 32 -> heatmap_stride resize-convs + 1x1 logits
    stride, cin_h, rh = 32, 512, (H // 32) * (W // 32)
    while stride > heatmap_stride:
        rh *= 4
        total += 3 * rh * 9 * cin_h * head_features * 2
        cin_h = head_features
        stride //= 2
    total += 3 * rh * cin_h * 8 * 2
    return float(total) * n_images


def _analytic_step_bytes(
    n_images, hw, n_params, stem_frozen=False, stem_grad_stride=1, frozen_stages=0
):
    """Training-step HBM bytes of the fused-backbone flagship from the kernel
    contracts (VERDICT r4 #5: Pallas custom calls are invisible to XLA's cost
    analysis, so `bytes accessed` collapsed to the augment/optimizer residue
    once fusion became the default — this mirrors `_analytic_step_flops` on
    the bytes axis).

    Derivation (bf16 activations, b=2 bytes; per camera image unless noted):

      * augmentation: one u8 read (H*W*3) + ~6 bf16 image passes (convert
        write, fused jiggle/planckian read+write, blur read+write, arcs r/w —
        ops/augment.py pipeline). The pass count is the one estimated term;
        it is ~2% of the step so its error is bounded.
      * stem (fused, ops/pallas/stem_fused.py): read the bf16 input once,
        write the pooled (H/4, W/4, 64) output once; interiors are
        VMEM-resident. Unfrozen stem adds a wgrad pass (re-read input + grad
        at 1/stem_grad_stride of the batch).
      * each fused bottleneck block (ops/pallas/block_fused.py — the saved-
        residual contract `_block_fwd_save_pallas`/`_block_bwd_saved_pallas`,
        which measured faster than in-kernel recompute at every geometry):
          fwd:  read x, write out, write saved h1+h2
          bwd:  read x + out + g + h1 + h2, write dx
        Projection entries (proj_fused.py `_proj_bwd_pallas`) follow the same
        contract with their stride geometry (h1 at r_in, h2/out at r_out).
        The stage-chain kernels save block boundaries instead of re-reading
        per-block x — byte-identical at this resolution.
        Frozen stages run forward-only WITHOUT the h1/h2 saves.
      * weights (per step, not per image): each fused kernel reads its folded
        weights once per pass (Mosaic caches constant-index blocks across the
        grid); backward writes f32 weight-grads.
      * optimizer: global-norm clip + Adam over n_params f32 = ~8 passes
        (read g twice, read p/m/v, write p/m/v).

    Head/loss (<0.5%) are ignored, like the FLOP model. Cross-check: at
    B=128 unfused exact-BN geometry the same enumeration plus BN-stats
    re-reads reproduces the round-2 XLA-measured 105.6 GB/step within ~10%."""
    H, W = hw
    b = 2.0
    per_img = 0.0
    # augmentation + convert (u8 read + ~6 bf16 passes)
    per_img += H * W * 3 * (1.0 + 6.0 * b)
    # stem: bf16 in once, pooled out once (+ optional subsampled wgrad pass)
    r_stem_out = (H // 4) * (W // 4)
    per_img += H * W * 3 * b + r_stem_out * 64 * b
    stem_off = stem_frozen or frozen_stages >= 1
    if not stem_off:
        per_img += (H * W * 3 + r_stem_out * 64) * b / stem_grad_stride
    weight_bytes = 0.0
    cin = 64
    r_in = r_stem_out
    for s, (k, F) in enumerate([(3, 64), (4, 128), (6, 256), (3, 512)]):
        cout = 4 * F
        r_out = r_in if s == 0 else r_in // 4
        train = s >= frozen_stages
        # projection entry
        per_img += r_in * cin * b + r_out * cout * b  # read x, write out
        if train:
            per_img += (r_in * F + r_out * F) * b  # save h1, h2
            per_img += (
                r_in * cin + 2 * r_out * cout + r_in * F + r_out * F + r_in * cin
            ) * b  # bwd reads + dx write
        # identity blocks
        n_id = k - 1
        per_img += n_id * 2 * r_out * cout * b  # read x, write out
        if train:
            per_img += n_id * 2 * r_out * F * b  # save h1, h2
            per_img += n_id * (3 * r_out * cout + 2 * r_out * F + r_out * cout) * b
        # weights: fwd read (+ bwd read + f32 dgrad write when training)
        wp = cin * F + 9 * F * F + F * cout + cin * cout
        wi = cout * F + 9 * F * F + F * cout
        wstage = wp + n_id * wi
        weight_bytes += wstage * b * (1 + (1 if train else 0)) + (
            wstage * 4.0 if train else 0.0
        )
        cin, r_in = cout, r_out
    opt_bytes = 8.0 * n_params * 4.0
    return per_img * n_images + weight_bytes + opt_bytes


def _bench_e2e(jax, jnp, train_step, state, batch_size, hw, n_steps=12, model=None, cfg=None):
    """End-to-end training throughput through the REAL input pipeline
    (VERDICT r2 #2): on-disk PNG dataset -> native libpng decoder ->
    HostDataLoader -> double-buffered H2D prefetch -> train step. Also reports
    the pipeline decomposition (host feed, H2D, compute) and a RAM-cached
    variant (decode amortized away) so the gap vs the compute-only headline is
    attributable. The reference's own defining bottleneck was this pipeline
    (argus/train.py:64 'something maxes the GPU throughput...').

    NOTE on this harness: the TPU is behind a loopback tunnel, so H2D runs at
    ~20 MB/s instead of PCIe/DMA rates — orders of magnitude below a co-located
    host. The decomposition numbers let a reader separate that harness tax from
    the pipeline design. Returns (extras_dict, state)."""
    from argus_tpu import native
    from argus_tpu.data import (
        CameraCubePoseDataset,
        CameraCubePoseDatasetConfig,
        HostDataLoader,
    )
    from argus_tpu.data.synthetic import write_synthetic_dataset
    from argus_tpu.parallel import device_prefetch, global_batch, make_mesh

    n_train = 4 * batch_size
    data_dir = f"/tmp/argus_e2e_{n_train}x{hw[0]}"
    marker = os.path.join(data_dir, f"{os.path.basename(data_dir)}.hdf5")
    if not os.path.exists(marker):
        write_synthetic_dataset(
            data_dir, n_train=n_train, n_test=8, height=hw[0], width=hw[1],
            pose_encoded="corners",
        )
    ds_cfg = CameraCubePoseDatasetConfig(dataset_path=data_dir, center_crop=hw)
    dataset = CameraCubePoseDataset(ds_cfg, train=True)
    workers = os.cpu_count() or 1
    loader = HostDataLoader(dataset, batch_size=batch_size, shuffle=True, num_workers=workers)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])

    # host feed alone (disk -> decode -> crop -> numpy batch)
    b0 = None
    t0 = time.perf_counter()
    nb = 0
    for b in loader:
        nb += 1
        b0 = b
    feed_ms = (time.perf_counter() - t0) / nb * 1e3

    # H2D alone (forced by fetching a reduction of the device copy)
    def h2d_once():
        d = global_batch(mesh, b0)
        return float(jnp.sum(d["images"][:, ::64, ::64, 0].astype(jnp.float32)))

    h2d_once()  # warm the tiny reduction program
    t0 = time.perf_counter()
    h2d_once()
    h2d_ms = (time.perf_counter() - t0) * 1e3

    # sustained end-to-end: loader + prefetch + train step, across epochs
    steps = 0
    epoch = 0
    t0 = time.perf_counter()
    while steps < n_steps:
        loader.set_epoch(epoch)
        epoch += 1
        for db in device_prefetch(loader, mesh):
            state, loss = train_step(state, db)
            steps += 1
            if steps >= n_steps:
                break
    float(loss)
    e2e_dt = time.perf_counter() - t0
    e2e_img_s = 2 * batch_size * steps / e2e_dt

    # RAM-cached variant: all images decoded once, steps stream slices — isolates
    # the decode cost from H2D+compute (the 'keep datasets resident' serving shape)
    all_imgs = dataset.load_images_batch(list(range(len(dataset))), n_threads=workers)
    poses = dataset.cube_poses
    mask = np.ones((batch_size,), np.float32)

    def ram_batches(n, seed=1):
        rng = np.random.default_rng(seed)
        for _ in range(n):
            sel = rng.integers(0, len(dataset), batch_size)
            yield {
                "images": all_imgs[sel],
                "cube_pose": poses[sel].astype(np.float32),
                "mask": mask,
            }

    for db in device_prefetch(ram_batches(2), mesh):
        state, loss = train_step(state, db)
    float(loss)
    t0 = time.perf_counter()
    for db in device_prefetch(ram_batches(n_steps), mesh):
        state, loss = train_step(state, db)
    float(loss)
    ram_dt = time.perf_counter() - t0
    ram_img_s = 2 * batch_size * n_steps / ram_dt

    # device-RESIDENT variant (VERDICT r3 next-round #3): the split lives in
    # HBM, each epoch is ONE on-chip program (on-device permutation + lax.scan
    # of the full step body, train.make_resident_epoch_step) — the host ships
    # one integer per epoch. This is the production train() path for datasets
    # under TrainConfig.device_resident_mb, and the number that should sit
    # within ~15% of the compute-only headline.
    resident_img_s = None
    if model is not None and cfg is not None:
        import dataclasses

        from argus_tpu.train import make_resident_epoch_step

        rcfg = dataclasses.replace(cfg, batch_size=batch_size)
        epoch_step, k = make_resident_epoch_step(model, rcfg, base_seed=0, n_examples=n_train)
        d_imgs, d_poses = jnp.asarray(all_imgs), jnp.asarray(poses.astype(np.float32))
        rstate = jax.tree_util.tree_map(jnp.copy, state)
        rstate, losses = epoch_step(rstate, d_imgs, d_poses, jnp.int32(0))  # compile
        float(losses[-1])
        n_epochs = max(1, n_steps // k)
        t0 = time.perf_counter()
        for e in range(n_epochs):
            rstate, losses = epoch_step(rstate, d_imgs, d_poses, jnp.int32(e + 1))
        float(losses[-1])
        resident_dt = time.perf_counter() - t0
        resident_img_s = 2 * n_train * n_epochs / resident_dt

    # SHARDED-resident variant (round 5): the mitigation for datasets PAST the
    # HBM budget (VERDICT r4 weak item) — epoch-level resident shard swaps
    # with double-buffered bulk uploads (data/resident.ResidentShardedData +
    # per-shard on-chip programs). Budget forced to a third of the split so
    # the path actually shards. On this harness the ~20 MB/s tunnel dominates
    # (a co-located host hides the swap behind compute); the number is the
    # honest bulk-transfer-vs-per-step-feed comparison under the same pipe.
    sharded_img_s = None
    if model is not None and cfg is not None:
        try:
            import dataclasses

            from argus_tpu.data import DeviceResidentData, ResidentShardedData
            from argus_tpu.train import make_resident_epoch_step

            # half-split budget -> quarter-split shards = exactly batch_size
            # examples each (n_train = 4*batch_size): ONE compiled whole-shard
            # program, no padding waste
            budget_mb = DeviceResidentData.bytes_estimate(dataset) / 2 / 2**20
            rs = ResidentShardedData(dataset, budget_mb, n_threads=workers)
            rcfg = dataclasses.replace(cfg, batch_size=batch_size)
            shard_steps = {
                n_k: make_resident_epoch_step(model, rcfg, base_seed=0, n_examples=n_k)[0]
                for n_k in {rs.shard_size, rs.tail_size}
            }
            sstate = jax.tree_util.tree_map(jnp.copy, state)
            for d_i, d_p, seg, n_k in rs.epoch_shards(0):  # compile epoch
                sstate, sl = shard_steps[n_k](sstate, d_i, d_p, jnp.int32(seg))
            float(sl[-1])
            t0 = time.perf_counter()
            n_ep_s = 2
            for e in range(1, 1 + n_ep_s):
                for d_i, d_p, seg, n_k in rs.epoch_shards(e):
                    sstate, sl = shard_steps[n_k](sstate, d_i, d_p, jnp.int32(seg))
            float(sl[-1])
            sharded_img_s = 2 * n_train * n_ep_s / (time.perf_counter() - t0)
        except Exception as e:  # surfaced in the extras, never fatal
            sharded_img_s = f"error: {type(e).__name__}: {e}"

    extras = {
        "e2e_images_per_sec": round(e2e_img_s, 2),
        "e2e_step_wall_ms": round(e2e_dt / steps * 1e3, 2),
        "ram_cached_images_per_sec": round(ram_img_s, 2),
        "resident_images_per_sec": round(resident_img_s, 2) if resident_img_s else None,
        "sharded_resident_images_per_sec": (
            round(sharded_img_s, 2) if isinstance(sharded_img_s, float) else sharded_img_s
        ),
        "feed_ms_per_batch": round(feed_ms, 2),
        "h2d_ms_per_batch": round(h2d_ms, 2),
        "native_decoder": native.available(),
        "n_examples_on_disk": n_train,
        "host_cpus": workers,
    }
    return extras, state


def main() -> None:
    import threading

    import jax

    # Backend-init watchdog: a dead remote-TPU tunnel makes jax.devices() hang
    # FOREVER (observed after a tunnel-relay crash) — emit an error JSON line
    # instead of silently eating the harness's whole time budget. Disarmed the
    # moment device discovery returns; never fires during (slow) compiles.
    def _no_backend():
        print(
            json.dumps(
                {
                    "metric": "train_images_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "images/sec",
                    "vs_baseline": 0.0,
                    "extras": {"error": "backend init timed out (TPU tunnel down?)"},
                }
            ),
            flush=True,
        )
        os._exit(17)

    watchdog = threading.Timer(float(os.environ.get("BENCH_INIT_TIMEOUT", 600)), _no_backend)
    watchdog.daemon = True
    watchdog.start()
    n_dev = len(jax.devices())
    watchdog.cancel()
    assert n_dev >= 1

    # persistent compilation cache: repeat bench runs skip the multi-minute remote
    # compiles (harmless no-op if the backend doesn't support it)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.ops.augment import AugmentationConfig
    from argus_tpu.train import TrainConfig, create_train_state, make_train_step
    from argus_tpu.geom import se3_exp

    # B=256 global (512 camera images) is the throughput/latency knee of the
    # fused step on v5e-1: 6,838 img/s @128 -> 6,955 @192 -> 7,122 @256 ->
    # 7,190 @384 -> 7,299 @512 -> 7,352 @768 (MFU 0.52 -> 0.556 asymptote;
    # docs/ROUND3_NOTES.md batch-scaling log). Past 256 each doubling buys
    # <1.5% while step latency doubles. (The old B=128 optimum was measured
    # on the 145 ms exact-BN step, where BN-stats HBM traffic dominated.)
    batch_size = int(os.environ.get("BENCH_BATCH", 256))
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    # BENCH_HW / BENCH_BACKBONE shrink the problem for CPU smoke tests of the
    # bench harness itself; real runs always use the reference shape.
    hw = (int(os.environ.get("BENCH_HW", 256)),) * 2
    backbone = os.environ.get("BENCH_BACKBONE", "resnet50")

    # The flagship configuration is a fine-tune of an ImageNet-pretrained ResNet-50
    # (the reference's only published mode, argus/models.py:43 pretrained=True), so
    # the default benches frozen-BN fine-tune semantics — full torchvision
    # FrozenBatchNorm2d: running stats AND scale/bias are non-trainable buffers
    # (models/pose_cnn.py rationale + docs/ROUND2_NOTES.md measurements).
    # BENCH_BN=frozentrain keeps scale/bias trainable; BENCH_BN=exact benches
    # train-mode batch statistics (the reference's literal train step).
    bn_mode = os.environ.get("BENCH_BN", "frozen")
    # The fused-backbone Pallas path (whole-block + projection + stem kernels)
    # is the model default ("auto" = on under TPU); BENCH_FUSE=off benches the
    # pure-XLA step for comparison (103.3 vs 90.6 ms/step, docs/ROUND3_NOTES.md).
    fuse = "off" if os.environ.get("BENCH_FUSE", "auto") == "off" else "auto"
    # Frozen-stem fine-tune (stop-gradient at the stem output — drops the stem
    # backward; models/resnet.py stem_frozen) is the flagship default: under
    # BOTH protocols it matches or beats exact full backprop on accuracy
    # (transfer-shifted ACCURACY_r04.json: 13.0 vs 13.5 cm held-out; r3
    # same-distribution: 6.35 vs 8.53 deg) while dropping the stem backward.
    # BENCH_STEM=full restores the full stem gradient; BENCH_STEM=gradK
    # (e.g. grad4) benches the subsampled stem weight-grad.
    stem_mode = os.environ.get("BENCH_STEM", "frozen")
    if stem_mode == "full":
        stem_mode = ""
    stem_frozen = stem_mode == "frozen"
    stem_grad_stride = int(stem_mode[4:]) if stem_mode.startswith("grad") else 1
    # BENCH_FROZEN_STAGES=k freezes the stem + stages 0..k-1 (progressive layer
    # freezing, models/resnet.py frozen_stages) — the frozen stages' backward
    # kernels drop out of the step. Default 0 = FULL BACKPROP through all four
    # stages, the reference's training semantics (argus/train.py:315-320).
    # Round 3 defaulted k=3 on a convergence A/B that pretrained on the same
    # distribution it fine-tuned on — a protocol that structurally favors
    # freezing (VERDICT r3 #1). The round-4 TRANSFER-shifted A/B (disjoint
    # pretrain/fine-tune render styles, held-out-test eval, ACCURACY_r04.json)
    # reversed the verdict: stage freezing degrades held-out translation badly
    # (k=1..3: 114-177 cm vs full backprop 13.5 cm) while frozen-BN+stem
    # matches exact full backprop (13.0 vs 13.5 cm). So the headline config is
    # full backprop with frozen BN + frozen stem; the k=3 step time is still
    # reported in extras as `frozen_finetune_k3` (decision log:
    # docs/ROUND4_NOTES.md).
    frozen_stages = int(os.environ.get("BENCH_FROZEN_STAGES", "0"))
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2,
            backbone=backbone,
            resnet_output_dim=1024 if backbone == "resnet50" else 64,
            bn_frozen=bn_mode.startswith("frozen"),
            bn_frozen_affine=(bn_mode == "frozen"),
            stem_frozen=stem_frozen,
            stem_grad_stride=stem_grad_stride,
            frozen_stages=frozen_stages,
            fuse_block=fuse,
            fuse_proj=fuse,
            fuse_stem=fuse,
            fuse_stage=fuse,
        ),
        augmentation_config=AugmentationConfig(),
        use_augmentation=True,
        amp=True,  # bf16 compute
        wandb_log=False,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    train_step = make_train_step(model, cfg, base_seed=0)

    rng = np.random.default_rng(0)
    # Feed the compute bench from the rendered corners dataset (the same one
    # the e2e section uses) rather than random noise with a constant pose:
    # step time is shape-bound either way, but real images + real poses give
    # the step realistic activation statistics and a meaningful train loss
    # (VERDICT r4 weak item). Falls back to noise if rendering is unavailable.
    def real_batch():
        from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig
        from argus_tpu.data.synthetic import write_synthetic_dataset

        n_train = 4 * batch_size
        data_dir = f"/tmp/argus_e2e_{n_train}x{hw[0]}"
        marker = os.path.join(data_dir, f"{os.path.basename(data_dir)}.hdf5")
        if not os.path.exists(marker):
            write_synthetic_dataset(
                data_dir, n_train=n_train, n_test=8, height=hw[0], width=hw[1],
                pose_encoded="corners",
            )
        ds = CameraCubePoseDataset(
            CameraCubePoseDatasetConfig(dataset_path=data_dir, center_crop=hw), train=True
        )
        sel = list(range(batch_size))
        return {
            "images": jnp.asarray(ds.load_images_batch(sel)),
            "cube_pose": jnp.asarray(np.asarray(ds.cube_poses[sel], np.float32)),
            "mask": jnp.ones((batch_size,), jnp.float32),
        }

    try:
        batch = real_batch()
    except Exception:
        batch = {
            "images": jnp.asarray(rng.integers(0, 256, (batch_size, *hw, 6), dtype=np.uint8)),
            "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (batch_size, 1)),
            "mask": jnp.ones((batch_size,), jnp.float32),
        }

    # ── training throughput ──
    # NOTE: block_until_ready is unreliable through the remote-TPU tunnel this runs
    # under; a host fetch of a scalar (float(loss)) is the honest synchronization.
    state, loss = train_step(state, batch)  # compile + warmup (populates the cache)
    float(loss)
    # roofline accounting straight from the compiled program — AFTER the warmup so
    # the AOT lowering hits the persistent cache instead of compiling twice
    step_flops = step_bytes = None
    try:
        ca = train_step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0))
        step_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass
    # Pallas custom calls are invisible to the XLA cost analysis; once the
    # fused backbone became the default the compiled-program count collapsed
    # to the augmentation/optimizer residue. Detect that and switch to the
    # architecture-derived FLOP count and the kernel-contract bytes model
    # (_analytic_step_bytes — VERDICT r4 #5: hbm_util must not be null).
    analytic = _analytic_step_flops(
        2 * batch_size, hw, stem_frozen, stem_grad_stride, frozen_stages
    )
    bytes_source = "xla"
    if step_flops is None or step_flops < 0.5 * analytic:
        step_flops = analytic
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
        )
        step_bytes = _analytic_step_bytes(
            2 * batch_size, hw, n_params, stem_frozen, stem_grad_stride, frozen_stages
        )
        bytes_source = "analytic"
    state, loss = train_step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = train_step(state, batch)
    float(loss)  # forces the whole sequential chain
    dt = time.perf_counter() - t0
    examples_per_sec = batch_size * n_steps / dt
    images_per_sec = 2 * examples_per_sec  # 2 cameras per example

    # ── secondary configuration: the frozen-fine-tune (k=3) step, in the SAME
    # artifact (VERDICT r3 #2: one number per configuration family, both in the
    # JSON). k=3 was round 3's headline; the transfer-shifted A/B found its
    # accuracy unsupported (ACCURACY_r04.json), so it is demoted to a labeled
    # secondary. BENCH_SECOND=0 skips.
    second = None
    if os.environ.get("BENCH_SECOND", "1") != "0" and frozen_stages != 3:
        import dataclasses

        cfg3 = dataclasses.replace(
            cfg, model_config=dataclasses.replace(cfg.model_config, frozen_stages=3)
        )
        model3, state3 = create_train_state(cfg3, jax.random.PRNGKey(0), hw)
        step3 = make_train_step(model3, cfg3, base_seed=0)
        state3, loss3 = step3(state3, batch)
        float(loss3)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state3, loss3 = step3(state3, batch)
        float(loss3)
        dt3 = time.perf_counter() - t0
        flops3 = _analytic_step_flops(2 * batch_size, hw, stem_frozen, stem_grad_stride, 3)
        second = {
            "step_ms": round(dt3 / n_steps * 1e3, 2),
            "images_per_sec": round(2 * batch_size * n_steps / dt3, 2),
            "mfu": round(flops3 / (dt3 / n_steps) / 197e12, 4),
            "batch": batch_size,
            "frozen_stages": 3,
            "accuracy_caveat": "shifted A/B: held-out translation degrades monotonically in k, ~1.28x at k=3 (ACCURACY_r05.json)",
        }
        del model3, state3, step3

    # ── gradient accumulation at large effective batch (VERDICT r4 #7) ──
    # The remat ladder showed B=384 full-backprop OOMs on saved residuals
    # (docs/ROUND4_NOTES.md); ROUND4_NOTES recommends grad_accum_steps as the
    # B>=512 lever — this measures it instead of asserting it. Microbatches at
    # the headline batch size, so per-microbatch activation memory is
    # unchanged; frozen BN makes accumulation exact (train.py assert).
    # BENCH_GRAD_ACCUM=0 skips; BENCH_ACCUM_BATCH sets the effective batch.
    grad_accum = None
    if (
        os.environ.get("BENCH_GRAD_ACCUM", "1") != "0"
        and bn_mode == "frozen"
    ):
        try:
            import dataclasses

            eff = int(os.environ.get("BENCH_ACCUM_BATCH", 2 * batch_size))
            k_acc = max(2, eff // batch_size)
            eff = k_acc * batch_size
            cfg_ga = dataclasses.replace(cfg, grad_accum_steps=k_acc)
            batch_ga = {
                "images": jnp.concatenate([batch["images"]] * k_acc, axis=0),
                "cube_pose": jnp.concatenate([batch["cube_pose"]] * k_acc, axis=0),
                "mask": jnp.ones((eff,), jnp.float32),
            }
            model_ga, state_ga = create_train_state(cfg_ga, jax.random.PRNGKey(0), hw)
            step_ga = make_train_step(model_ga, cfg_ga, base_seed=0)
            state_ga, loss_ga = step_ga(state_ga, batch_ga)
            float(loss_ga)
            n_ga = max(4, n_steps // 2)
            t0 = time.perf_counter()
            for _ in range(n_ga):
                state_ga, loss_ga = step_ga(state_ga, batch_ga)
            float(loss_ga)
            dt_ga = time.perf_counter() - t0
            flops_ga = _analytic_step_flops(
                2 * eff, hw, stem_frozen, stem_grad_stride, frozen_stages
            )
            grad_accum = {
                "eff_batch": eff,
                "accum_steps": k_acc,
                "step_ms": round(dt_ga / n_ga * 1e3, 2),
                "images_per_sec": round(2 * eff * n_ga / dt_ga, 2),
                "mfu": round(flops_ga / (dt_ga / n_ga) / 197e12, 4),
            }
            del model_ga, state_ga, step_ga, batch_ga
        except Exception as e:  # never lose the headline to the accum probe
            grad_accum = {"error": f"{type(e).__name__}: {e}"}

    # ── keypoint-family training throughput ──
    # The corner-heatmap + differentiable-PnP family is the round-4 ACCURACY
    # headline (the only family that learns rotation under the transfer-shifted
    # protocol: 4.5 deg / 0.47 cm held-out, ACCURACY_r04.json) but had no
    # throughput number in any artifact. Default config (resnet18 encoder,
    # exact BN — what the A/B trained), amp bf16. BENCH_KEYPOINT=0 skips.
    keypoint = None
    if os.environ.get("BENCH_KEYPOINT", "1") != "0":
        try:
            import dataclasses

            from argus_tpu.models.keypoint_net import CubeKeypointNetConfig

            def kp_measure(kp_config):
                kcfg = dataclasses.replace(
                    cfg, model_type="keypoint", keypoint_config=kp_config
                )
                kmodel, kstate = create_train_state(kcfg, jax.random.PRNGKey(0), hw)
                kstep = make_train_step(kmodel, kcfg, base_seed=0, hw=hw)
                kstate, kloss = kstep(kstate, batch)  # compile + warmup
                float(kloss)
                t0 = time.perf_counter()
                for _ in range(n_steps):
                    kstate, kloss = kstep(kstate, batch)
                float(kloss)
                dtk = time.perf_counter() - t0
                kflops = _analytic_kp_flops(
                    2 * batch_size, hw, stem_frozen=kp_config.stem_frozen
                )
                return {
                    "step_ms": round(dtk / n_steps * 1e3, 2),
                    "images_per_sec": round(2 * batch_size * n_steps / dtk, 2),
                    "mfu": round(kflops / (dtk / n_steps) / 197e12, 4),
                    "batch": batch_size,
                    "backbone": kp_config.backbone,
                }

            # the exact-BN config the accuracy A/B trains (its headline number)
            keypoint = kp_measure(CubeKeypointNetConfig())
            keypoint["accuracy_note"] = (
                "transfer headline family (held-out rot+trans; ACCURACY_r0{4,5}.json)"
            )
            # the frozen fine-tune perf config (VERDICT r4 #6): frozen BN
            # (+affine) + frozen stem on the family-default PURE-XLA path —
            # the fuse-split probe (.bench/probe_kp_fuse_split.py) measured
            # 75.6 ms frozen-XLA vs 103.4 exact vs 111.5 frozen-FUSED at
            # B=256: freezing wins 27.8 ms but the resnet18 BasicBlock fused
            # kernels LOSE 36 ms (64/128-channel lane underfill; the opposite
            # of the resnet50 flagship), so CubeKeypointNetConfig defaults
            # fuse_*="off". Accuracy evidence: the A/B's keypoint_frozen arm.
            if os.environ.get("BENCH_KP_FROZEN", "1") != "0":
                keypoint["frozen"] = kp_measure(
                    CubeKeypointNetConfig(
                        bn_frozen=True, bn_frozen_affine=True, stem_frozen=True
                    )
                )
                keypoint["frozen"]["accuracy_note"] = (
                    "A/B arm: keypoint_frozen (ACCURACY_r05.json)"
                )
        except Exception as e:  # never lose the headline to the secondary family
            keypoint = {"error": f"{type(e).__name__}: {e}"}

    # ── end-to-end throughput through the real input pipeline (BENCH_E2E=0 skips) ──
    e2e_extras = None
    if os.environ.get("BENCH_E2E", "1") != "0":
        try:
            e2e_extras, state = _bench_e2e(
                jax, jnp, train_step, state, batch_size, hw, model=model, cfg=cfg
            )
        except Exception as e:  # never lose the headline number to an e2e failure
            e2e_extras = {"error": f"{type(e).__name__}: {e}"}

    # ── single-frame inference latency (compiled images -> SE(3) pose) ──
    # Serving-shaped program: the fused training kernels lose at batch 1 (a
    # 2-image Pallas grid amortizes nothing), so inference compiles the
    # pure-XLA backbone — the same config serve.Estimator deploys. The fuse
    # options are variable-tree-neutral, so the trained state drops in.
    from argus_tpu.models import NCameraCNN
    from argus_tpu.serve import latency_tuned_config

    model = NCameraCNN(latency_tuned_config(cfg.model_config))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Per-call host timing would measure the harness's remote-TPU tunnel RTT
    # (~25 ms), not the device. Instead run a chain of N strictly serialized
    # inferences on-device (each step's input depends on the previous pose) and
    # divide — the honest single-frame device latency a co-located control loop
    # would see.
    def infer_chain(n):
        @jax.jit
        def run(variables, images):
            def body(_, img):
                pose = se3_exp(model.apply(variables, img, train=False))
                return img + 1e-12 * jnp.sum(pose)  # data dependency, value-neutral

            return jnp.sum(jax.lax.fori_loop(0, n, body, images))

        return run

    one = jnp.asarray(rng.integers(0, 256, (1, *hw, 6), dtype=np.uint8)).astype(jnp.float32) / 255.0
    short, long = infer_chain(4), infer_chain(104)
    float(short(variables, one))  # compile
    float(long(variables, one))

    def median_wall(fn, trials=5, imgs=None):
        # tunnel RTT jitter (tens of ms) can exceed the 100-step compute delta
        # on a loaded host — a single trial once produced a NEGATIVE latency;
        # per-length medians make the subtraction robust
        x = one if imgs is None else imgs
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(fn(variables, x))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[trials // 2]

    t_short = median_wall(short)
    t_long = median_wall(long)
    p50_ms = (t_long - t_short) / 100.0 * 1e3  # tunnel RTT + dispatch cancels out

    # ── batched serving throughput (VERDICT r3 #6) ──
    # Offline/batched inference (relabeling, multi-camera rigs, trajectory
    # scoring) takes serve.throughput_tuned_config: BN folded (eval-mode exact
    # BN == frozen BN), bf16, fused Pallas forward chains — the backbone
    # serve.Estimator now selects at/above SERVING_FUSED_MIN_BATCH. The trained
    # state drops in unchanged (variable-tree-neutral flags). BENCH_SERVING=0
    # skips.
    serving = None
    if os.environ.get("BENCH_SERVING", "1") != "0":
        try:
            from argus_tpu.serve import throughput_tuned_config

            b_serve = int(os.environ.get("BENCH_SERVE_BATCH", 256))
            smodel = NCameraCNN(throughput_tuned_config(cfg.model_config))
            imgs_b = jnp.asarray(
                rng.integers(0, 256, (b_serve, *hw, 6), dtype=np.uint8)
            ).astype(jnp.float32) / 255.0

            def serve_chain(n):
                @jax.jit
                def run(variables, images):
                    def body(_, img):
                        pose = se3_exp(smodel.apply(variables, img, train=False))
                        # serialize iterations through a (1,1,1,6) slice — a
                        # full-tensor carry would add ~0.8 GB/iter of HBM
                        # traffic at B=256 (ADVICE r3)
                        bump = (img[:1, :1, :1, :] + (1e-12 * jnp.sum(pose)).astype(img.dtype))
                        return jax.lax.dynamic_update_slice(img, bump, (0, 0, 0, 0))

                    return jnp.sum(jax.lax.fori_loop(0, n, body, images))

                return run

            s_short, s_long = serve_chain(2), serve_chain(22)
            float(s_short(variables, imgs_b))  # compile
            float(s_long(variables, imgs_b))
            ms_call = (median_wall(s_long, imgs=imgs_b) - median_wall(s_short, imgs=imgs_b)) / 20.0 * 1e3
            serving = {
                "batch": b_serve,
                "ms_per_call": round(ms_call, 3),
                "images_per_sec": round(2 * b_serve / (ms_call / 1e3), 2),
                "config": "fused-bf16-frozen (serve.throughput_tuned_config)",
            }
        except Exception as e:  # never lose the headline to a serving failure
            serving = {"error": f"{type(e).__name__}: {e}"}

    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
                "extras": {
                    "examples_per_sec": round(examples_per_sec, 2),
                    "batch_size": batch_size,
                    "inference_p50_ms": round(p50_ms, 3),
                    "final_train_loss": float(loss),
                    "bn_mode": bn_mode,
                    "stem_mode": stem_mode or "full",
                    "frozen_stages": frozen_stages,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                    # the denominator is an ESTIMATE (no published reference numbers)
                    "baseline_is_estimate": True,
                    "baseline_images_per_sec_est": BASELINE_IMAGES_PER_SEC,
                    # v5e roofline accounting (peaks: 197 TFLOP/s bf16, 819 GB/s HBM)
                    "step_ms": round(dt / n_steps * 1e3, 2),
                    "mfu": round(step_flops / (dt / n_steps) / 197e12, 4)
                    if step_flops
                    else None,
                    "hbm_util": round(step_bytes / (dt / n_steps) / 819e9, 4)
                    if step_bytes
                    else None,
                    "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
                    "step_gb": round(step_bytes / 1e9, 2) if step_bytes else None,
                    # "xla" = compiled-program cost analysis; "analytic" = the
                    # kernel-contract bytes model (fused backbone — see
                    # _analytic_step_bytes derivation)
                    "bytes_source": bytes_source,
                    # BOTH configuration families in one artifact (VERDICT r3 #2):
                    # the headline IS full backprop when frozen_stages=0
                    "full_backprop": (
                        {
                            "step_ms": round(dt / n_steps * 1e3, 2),
                            "images_per_sec": round(images_per_sec, 2),
                            "mfu": round(step_flops / (dt / n_steps) / 197e12, 4)
                            if step_flops
                            else None,
                            "batch": batch_size,
                            "is_headline": True,
                        }
                        if frozen_stages == 0
                        else None
                    ),
                    "frozen_finetune_k3": second,
                    # grad accumulation at effective B>=512 (VERDICT r4 #7)
                    "grad_accum": grad_accum,
                    # keypoint family (the transfer-accuracy headline)
                    "keypoint_train": keypoint,
                    # batched offline serving (fused-bf16-frozen forward)
                    "serving": serving,
                    # end-to-end pipeline (disk->decode->H2D->step) + decomposition
                    "e2e": e2e_extras,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
