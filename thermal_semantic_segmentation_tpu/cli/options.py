"""Argparse front-ends mirroring the reference ``options.py`` flag surface.

Flag names and defaults match options.py:4-122 plus the inline parsers in
self_train_main.py:145-181 and generate_pseudo_label.py:101-108, so command
lines written for the reference keep working. Two deliberate fixes:

- flags declared ``type=bool`` in the reference treat any non-empty string as
  True (argparse trap); here they parse 'false/0/no' correctly via str2bool.
- dataset roots are overridable (--freiburg_root / --source_root / ...)
  instead of hardcoded relative paths; defaults keep the reference layout.
"""

from __future__ import annotations

import argparse


class HostConfigParser(argparse.ArgumentParser):
    """ArgumentParser that applies host-side settings (decode cache) at
    parse time, so every entry point honors the common flags without
    per-main wiring."""

    def parse_args(self, *a, **kw):  # type: ignore[override]
        args = super().parse_args(*a, **kw)
        # distributed bring-up FIRST: jax.distributed.initialize must run
        # before anything touches a backend (make_mesh / device_put below a
        # CLI main would otherwise see only this host's chips)
        if getattr(args, "distributed", False):
            from ..parallel.mesh import init_distributed
            dist_kw = {}
            if getattr(args, "coordinator_address", ""):
                dist_kw["coordinator_address"] = args.coordinator_address
            for k in ("num_processes", "process_id"):
                if getattr(args, k, None) is not None:
                    dist_kw[k] = getattr(args, k)
            init_distributed(**dist_kw)
        cc = getattr(args, "compile_cache_dir", "")
        if cc:
            from ..core.compile_cache import enable_compile_cache
            enable_compile_cache(None if cc == "auto" else cc)
        mb = getattr(args, "decode_cache_mb", 0.0)
        disk = getattr(args, "decode_cache_dir", None)
        if mb or disk:
            from ..data.cache import set_decode_cache
            if disk:
                set_decode_cache(mb, disk_dir=disk)
            else:
                # no --decode_cache_dir on THIS command line: leave any
                # previously configured disk tier alone (disk_dir=None
                # means "explicitly clear" to set_decode_cache, which
                # would silently drop persistence when CLIs chain
                # in-process, e.g. the bench_all gates)
                set_decode_cache(mb)
        return args


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("yes", "true", "t", "y", "1"):
        return True
    if str(v).lower() in ("no", "false", "f", "n", "0", ""):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def _add_roots(parser: argparse.ArgumentParser):
    parser.add_argument('--freiburg_root', type=str, default='datasets/freiburg')
    parser.add_argument('--source_root', type=str, default='datasets/source_dataset')
    parser.add_argument('--kitti_root', type=str, default='datasets/kitti')
    parser.add_argument('--flir_root', type=str, default='datasets/target_dataset')
    parser.add_argument('--model_root_path', type=str,
                        default='./checkpoints/semantic_segmentation')
    parser.add_argument('--gan_model_root_path', type=str, default='./checkpoints')
    parser.add_argument('--bf16', type=str2bool, default=False,
                        help='bfloat16 compute dtype (TPU fast path).')
    parser.add_argument('--native_decode', type=str2bool, default=False,
                        help='batch-decode Freiburg frames with the native '
                             'C++ thread-pool decoder (bilinear resize; the '
                             'PIL path stays the BICUBIC parity default).')
    parser.add_argument('--native_encode', type=str2bool, default=False,
                        help='batch-encode translator/pseudo-label output '
                             'with the native C++ thread-pool encoder '
                             '(PIL-equivalent BICUBIC resize + libjpeg/libpng).')
    parser.add_argument('--wire', type=str, default='packed',
                        choices=['none', 'packed', 'packed_bf16'],
                        help='host->device batch transfer format: packed '
                             '(default; one compact lossless buffer per '
                             'batch), packed_bf16 (floats ship as bf16 — '
                             'identical for bf16-compute steps, see '
                             'data/wire.py), none (one device_put per leaf).')
    parser.add_argument('--decode_cache_mb', type=float, default=0.0,
                        help='in-RAM LRU for decoded frames (data/cache.py); '
                             'epoch 2+ skips PNG decode entirely. ~12000 '
                             'caches the full Freiburg train split. 0 = off.')
    parser.add_argument('--decode_cache_dir', type=str, default='',
                        help='disk tier for the decode cache: decoded frames '
                             'persist as .npy under this dir, so a FRESH '
                             'process/epoch-1 loads at the warm-RAM rate '
                             '(no PNG decode). Unbounded; delete the dir to '
                             'invalidate. Empty = off.')
    parser.add_argument('--remat', type=str, default='none',
                        choices=['none', 'dots', 'full'],
                        help='backbone rematerialization: none (fastest; '
                             'default), dots (save only matmul/conv outputs; '
                             'measured no memory benefit on TPU — XLA already '
                             'elides those residuals), full (save only block '
                             'boundaries — 2.2x lower peak HBM for ~15%% '
                             'throughput; large-batch/high-res training).')
    parser.add_argument('--layers', type=lambda s: tuple(
                            int(x) for x in s.split(',')),
                        default=(3, 4, 23, 3),
                        help='ResNet backbone block counts, comma-separated '
                             '(default 3,4,23,3 = ResNet-101). Small configs '
                             '(e.g. 1,1,1,1) drive the synthetic convergence '
                             'gate and smoke recipes.')
    parser.add_argument('--data_parallel', type=str2bool, default=False,
                        help='shard inference batches over ALL visible chips '
                             '(offline eval/pseudo-label/translator/'
                             'prototypes and the serve CLI; batch sizes that '
                             'do not divide the chip count shrink the mesh '
                             'with a warning). Trainers always TRAIN '
                             'data-parallel; this flag additionally shards '
                             'their validation loops.')
    parser.add_argument('--compile_cache_dir', type=str, default='auto',
                        help='persistent XLA compilation cache: a fresh '
                             'process re-running the same jitted program '
                             'skips XLA entirely (core/compile_cache.py; '
                             'works through the axon tunnel). "auto" '
                             '(default) = $TSS_COMPILE_CACHE_DIR or '
                             '~/.cache/thermal_semantic_segmentation_tpu/'
                             'xla-<host-fingerprint> (scoped so AOT CPU '
                             'entries never cross machines); '
                             'empty/"off"/"none"/"0" = disabled (so a '
                             'cache dir cannot literally be named one of '
                             'those sentinels).')
    parser.add_argument('--distributed', type=str2bool, default=False,
                        help='multi-host bring-up: call '
                             'jax.distributed.initialize() before any device '
                             'use, so the data-parallel mesh spans every '
                             'host in the job. On TPU pods the coordinator '
                             'is auto-detected from the TPU metadata; '
                             'elsewhere pass --coordinator_address/'
                             '--num_processes/--process_id. Trainer '
                             'DataLoaders already shard per host '
                             '(parallel.mesh.host_shard); offline CLIs '
                             'partition their datasets per process.')
    parser.add_argument('--coordinator_address', type=str, default='',
                        help='with --distributed: "host:port" of process 0 '
                             '(empty = auto-detect, the TPU-pod default).')
    parser.add_argument('--num_processes', type=int, default=None,
                        help='with --distributed: total process count '
                             '(default: auto-detect).')
    parser.add_argument('--process_id', type=int, default=None,
                        help='with --distributed: this process\'s rank '
                             '(default: auto-detect).')
    parser.add_argument('--seed', type=int, default=0)


def train_parse():
    """GAN translation training options (options.py:4-24)."""
    parser = HostConfigParser(description='train options')
    parser.add_argument('-batch_size', type=int, default=4)
    parser.add_argument('-sem_loss', type=str2bool, default=False)
    parser.add_argument('-load_model', type=str2bool, default=False)
    parser.add_argument('-checkpoint_name', type=str, default='freiburg_rgb2ir.pth')
    parser.add_argument('-new_checkpoint_name', type=str,
                        default='cityscapes_rgb2freiburg_ir.pth')
    parser.add_argument('-source_dataset', type=str, default='kitti')
    parser.add_argument('-target_dataset', type=str, default='freiburg_ir')
    parser.add_argument('-lr', type=float, default=0.0001)
    parser.add_argument('-num_epoch', type=int, default=65)
    parser.add_argument('-grayscale', type=str2bool, default=False)
    parser.add_argument('-s2t_input_nc', type=int, default=3)
    parser.add_argument('-t2s_input_nc', type=int, default=1)
    parser.add_argument('-normalize', type=float, nargs='+', default=[0.5, 0.5, 0.5])
    parser.add_argument('-with_contour', type=str2bool, default=False)
    parser.add_argument('-canny_thermal_threshold', type=float, default=1)
    parser.add_argument('-canny_rgb_threshold', type=float, default=2.5)
    parser.add_argument('-cycle', type=str2bool, default=True,
                        help='CycleGAN (main.py) vs one-direction GAN (main_gan.py).')
    parser.add_argument('-host_pool', type=str2bool, default=False,
                        help='reference-style host-side ImagePool between '
                             'separate G/D steps (slow over the axon tunnel); '
                             'default is the fused step with a device pool.')
    parser.add_argument('-sem_checkpoint_s', type=str, default='',
                        help='pretrained 3-ch legacy DeepLab weights (.pth torch '
                             'or native) for the frozen RGB sem net; the '
                             'reference downloads these from a model zoo '
                             '(semantic_segmentation_models.py:190-198).')
    parser.add_argument('-sem_checkpoint_t', type=str, default='',
                        help='pretrained 1-ch thermal legacy DeepLab weights '
                             'for the frozen thermal sem net (main.py:81).')
    parser.add_argument('-sem_mode', type=str, default='legacy',
                        choices=('legacy', 'module2'),
                        help="frozen sem-net architecture: 'legacy' = the "
                             "reference's zoo-pretrained legacy DeepLabs "
                             "(main.py:80-81); 'module2' = this repo's own "
                             "segmentation_train checkpoints (arch read from "
                             "each checkpoint's meta, [0,1] input scale) — "
                             "requires both -sem_checkpoint_s/_t.")
    parser.add_argument('-log_interval', type=int, default=10)
    parser.add_argument('-ngf', type=int, default=64,
                        help='UNet generator base width. The reference '
                             'hardcodes 64 (main.py:76-79) — keep the '
                             'default for recipe parity; small values make '
                             'CPU wiring smokes tractable (a 64-wide '
                             'CycleGAN step takes tens of minutes per step '
                             'on one CPU core). Downstream consumers '
                             '(translator, serve, exports) rebuild the net '
                             'from the checkpoint width automatically.')
    parser.add_argument('-max_steps', type=int, default=0,
                        help='debug: cap steps per epoch (0 = unlimited).')
    parser.add_argument('-save_interval', type=int, default=1,
                        help='checkpoint every N epochs (the final epoch '
                             'always saves). The reference saves every epoch '
                             '(train.py:262-270) — that is the default — but '
                             'a GAN checkpoint is ~450 MB and on a slow '
                             'host link the per-epoch fetch can dominate '
                             'short epochs.')
    _add_roots(parser)
    return parser


def translation_parse():
    """Offline translator options (options.py:27-48)."""
    parser = HostConfigParser(description='translation options')
    parser.add_argument('--root', type=str, default='')
    parser.add_argument('-dataset', type=str, default='Cityscapes')
    parser.add_argument('-batch_size', type=int, default=1)
    parser.add_argument('-checkpoint_name', type=str,
                        default='cityscapes_rgb2freiburg_ir.pth')
    parser.add_argument('-input_nc', type=int, default=3)
    parser.add_argument('-output_nc', type=int, default=1)
    parser.add_argument('-save_image_size', type=int, nargs=2, default=[1024, 2048])
    parser.add_argument('-normalize', type=float, nargs='+', default=[0.5, 0.5, 0.5])
    parser.add_argument('-denormalize', type=float, nargs='+', default=[0.5])
    parser.add_argument('-grayscale', type=str2bool, default=False)
    parser.add_argument('-generator_type', type=str, default='s2t')
    parser.add_argument('-translation_name_suffix', type=str, default='cityscapes')
    _add_roots(parser)
    return parser


def seg_parse():
    """Segmentation training options (options.py:51-80)."""
    parser = HostConfigParser(description='segmentation options')
    parser.add_argument('--root', type=str, default='')
    parser.add_argument('-load_model', type=str2bool, default=False)
    parser.add_argument('-epochs', type=int, default=50)
    parser.add_argument('-batch_size', type=int, default=8)
    parser.add_argument('-val_batch_size', type=int, default=8)
    parser.add_argument('-checkpoint_name', type=str,
                        default='256_cityscapes_rgb2freiburg_ir_segmentation.pth')
    parser.add_argument('-new_checkpoint_name', type=str,
                        default='256_cityscapes_rgb2freiburg_ir_segmentation.pth')
    parser.add_argument('-num_samples_show', type=int, default=3)
    parser.add_argument('-net_mode', type=str, default='one_channel')
    parser.add_argument('-dataset', type=str, default='cityscapes_translation')
    parser.add_argument('-num_classes', type=int, default=13)
    parser.add_argument('-lr', type=float, default=0.0001)
    parser.add_argument('-data_split', type=str2bool, default=False)
    parser.add_argument('-translation_name', type=str, default='freiburg_rgb2ir_130epochs')
    parser.add_argument('-visualize_prediction', type=str2bool, default=False)
    parser.add_argument('-ignore_index', type=int, default=12)
    parser.add_argument('-generator_type', type=str, default='s2t')
    parser.add_argument('-t2s_folder', type=str, default='test_cityscapes_rgb2freiburg_ir/')
    parser.add_argument('-baseline', type=str2bool, default=False)
    parser.add_argument('-source_domain', type=str, default='Thermal')
    parser.add_argument('-target_domain', type=str, default='Grayscale')
    parser.add_argument('-with_feat', type=str2bool, default=False)
    parser.add_argument('-logdir', type=str, default='./logs')
    parser.add_argument('-grayscale', type=str2bool, default=False)
    parser.add_argument('-log_interval', type=int, default=10)
    parser.add_argument('-max_steps', type=int, default=0)
    parser.add_argument('-device_aug', type=str2bool, default=False,
                        help='fused device-side RandomResizedCrop+flip '
                             '(host pipeline only decodes).')
    parser.add_argument('-lr_groups', type=str2bool, default=False,
                        help='1x backbone / 10x head LR split.')
    parser.add_argument('-bn_mode', type=str, default='sync',
                        choices=['sync', 'per_replica'],
                        help="batch-norm stats under the mesh: 'sync' sees "
                             "the global batch; 'per_replica' matches the "
                             "reference's single-device BN semantics.")
    parser.add_argument('-grad_accum', type=int, default=1,
                        help='microbatch count per optimizer step (lax.scan; '
                             'grads averaged, BN stats sequential). Cuts '
                             'activation memory ~grad_accum-fold; combine '
                             'with --remat full for high-res training.')
    _add_roots(parser)
    return parser


def evaluation_parse():
    """Evaluation options (options.py:83-103)."""
    parser = HostConfigParser(description='segmentation options')
    parser.add_argument('--root', default='')
    parser.add_argument('-val_batch_size', type=int, default=1)
    parser.add_argument('-checkpoint_name', type=str,
                        default='256_freiburg_rgb2ir_segmentation.pth')
    parser.add_argument('-new_checkpoint_name', type=str, default='')
    parser.add_argument('-num_samples_show', type=int, default=3)
    parser.add_argument('-net_mode', type=str, default='one_channel')
    parser.add_argument('-dataset', type=str, default='freiburg_ir')
    parser.add_argument('-grayscale', type=str2bool, default=False)
    parser.add_argument('-num_classes', type=int, default=13)
    parser.add_argument('-data_split', type=str2bool, default=False)
    parser.add_argument('-translation_name', type=str,
                        default='cityscapes_rgb2freiburg_ir')
    parser.add_argument('-visualize_prediction', default=None)
    parser.add_argument('-ignore_index', type=int, default=12)
    parser.add_argument('-generator_type', type=str, default='s2t')
    parser.add_argument('-t2s_folder', type=str, default='test_cityscapes_rgb2freiburg_ir/')
    parser.add_argument('-baseline', type=str2bool, default=False)
    parser.add_argument('-source_domain', type=str, default='Thermal')
    parser.add_argument('-target_domain', type=str, default='Grayscale')
    _add_roots(parser)
    return parser


def calc_proto_parse():
    """Prototype computation options (options.py:105-118)."""
    parser = HostConfigParser(description='prototype computation options.')
    parser.add_argument('-normalize', type=float, nargs='+', default=[0.5])
    parser.add_argument('-net_mode', type=str, default='one_channel')
    parser.add_argument('-dataset', type=str, default='freiburg_ir')
    parser.add_argument('-num_classes', type=int, default=13)
    parser.add_argument('-root', type=str, default='')
    parser.add_argument('-epochs', type=int, default=4)
    parser.add_argument('-batch_size', type=int, default=64)
    parser.add_argument('-checkpoint_name', type=str,
                        default='freiburg_rgb2ir_cityscapes_segmentation.pth')
    parser.add_argument('-with_feat', type=str2bool, default=True)
    parser.add_argument('-max_steps', type=int, default=0)
    _add_roots(parser)
    return parser


def pseudo_generation_parse():
    """Pseudo-label generation options (generate_pseudo_label.py:101-108)."""
    parser = HostConfigParser(description="config")
    parser.add_argument('--root', type=str, default='')
    parser.add_argument('--soft', type=str2bool, default=False)
    parser.add_argument('--flip', type=str2bool, default=False)
    parser.add_argument('-checkpoint_name', default='256_freiburg_rgb2ir_segmentation.pth')
    parser.add_argument('-batch_size', type=int, default=4)
    parser.add_argument('--dataset', default='freiburg_ir')
    parser.add_argument('-pseudo_type', default='hard')
    parser.add_argument('-translation_name', type=str, default='freiburg_rgb2ir_130epochs')
    parser.add_argument('-grayscale', type=str2bool, default=False)
    parser.add_argument('-max_steps', type=int, default=0)
    _add_roots(parser)
    return parser


def self_train_parse():
    """Self-training options (self_train_main.py:145-181)."""
    parser = HostConfigParser(description="config")
    parser.add_argument('--root', type=str, default='')
    parser.add_argument('--resize', type=int, default=1200)
    parser.add_argument('--rcrop', type=int, nargs=2, default=[512, 256])
    parser.add_argument('--hflip', type=float, default=0.5)
    parser.add_argument('--proto_rectify', type=str2bool, default=True)
    parser.add_argument('--load_model', type=str2bool, default=True)
    parser.add_argument('-checkpoint_name', default='256_freiburg_rgb2ir_segmentation.pth')
    parser.add_argument('-new_checkpoint_name',
                        default='256_freiburg_rgb2ir_tem_0.5_thres_0.3_segmentation.pth')
    parser.add_argument('-batch_size', type=int, default=4)
    parser.add_argument('--use_saved_pseudo', type=str2bool, default=True)
    parser.add_argument('--self_train', type=str2bool, default=True)
    parser.add_argument('--path_soft', type=str, default='')
    parser.add_argument('--path_lp', type=str, default='')
    parser.add_argument('-pseudo_type', default='soft')
    parser.add_argument('-translation_name', type=str, default='freiburg_rgb2ir_130epochs')
    parser.add_argument('--epochs', type=int, default=10)
    parser.add_argument('--lr', type=float, default=0.000001)
    parser.add_argument('--num_classes', type=int, default=13)
    parser.add_argument('--ignore_index', type=int, default=12)
    parser.add_argument('--ema', type=str2bool, default=True)
    parser.add_argument('--proto_temperature', type=float, default=0.5)
    parser.add_argument('--train_thred', type=float, default=0)
    parser.add_argument('--rce', type=str2bool, default=True)
    parser.add_argument('--rce_alpha', type=float, default=0.1)
    parser.add_argument('--rce_beta', type=float, default=1.0)
    parser.add_argument('--moving_prototype', type=str2bool, default=True)
    parser.add_argument('--proto_momentum', type=float, default=0.0001)
    parser.add_argument('--visualize_prediction', default='save_one')
    parser.add_argument('--iter_counter', type=int, default=0)
    parser.add_argument('--baseline', type=str2bool, default=False)
    parser.add_argument('--generator_type', default=None)
    parser.add_argument('--target_dataset', default='freiburg_ir')
    parser.add_argument('--threshold', type=float, default=0.3)
    parser.add_argument('--val_interval', type=int, default=500)
    parser.add_argument('-max_steps', type=int, default=0)
    _add_roots(parser)
    return parser
