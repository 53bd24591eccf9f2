"""Testing CLI — flag-for-flag surface of the reference's sem_seg_testing.py
(parse_args at /root/reference/sem_seg_testing.py:54-82, main flow :348-508):
whole-scene multi-vote inference of the held-out --test_area tile with
per-class IoU reporting and .txt/.obj artifacts.
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from pathlib import Path

from tumseg.cli.common import make_logger
from tumseg.data.dataset import TestGridDataset
from tumseg.data.features import GEO_FEATURE_NAMES, attach_geofeatures
from tumseg.infer import InferenceRunner, run_testing
from tumseg.utils.labels import class_tables
from tumseg.utils.timing import current_time, time_print
from tumseg import models
from tumseg.train import checkpoint as ckpt

saveTest = "testdataset.pkl"
saveDir = os.environ.get("TUMSEG_SAVE_DIR", "./data/saved_data/")


def parse_args(argv=None):
    parser = argparse.ArgumentParser("Model")
    parser.add_argument("--model", type=str, default="pointnet2_sem_seg",
                        help="model name [default: pointnet_sem_seg]")
    parser.add_argument("--batch_size", type=int, default=32,
                        help="batch size in testing [default: 32]")
    parser.add_argument("--gpu", type=str, default="0",
                        help="specify gpu device")
    parser.add_argument("--num_point", type=int, default=4096,
                        help="point number [default: 4096]")
    parser.add_argument("--log_dir", type=str, default="pointnet2_sem_seg",
                        help="log directory")
    parser.add_argument("--exp_dir", type=str, default="log/sem_seg/",
                        help="Log path [default: None]")
    parser.add_argument("--visual", action="store_true", default=False,
                        help="visualize result [default: False]")
    parser.add_argument("--num_votes", type=int, default=5,
                        help="aggregate segmentation scores with voting "
                             "[default: 5]")
    parser.add_argument("--output_model", type=str, default="/best_model.pth",
                        help="model output name")
    parser.add_argument("--test_area", type=str,
                        default="cc_o_clipped_Local_DEBY_LOD2_4959323_cc.las",
                        help="Which area to use for test, option: 1-6 [default: 5]")
    parser.add_argument("--rootdir", type=str,
                        default="/content/drive/MyDrive/ data/tum/tum-facade/"
                                "training/cc_selected/CC/",
                        help="directory to data")
    parser.add_argument("--load", type=bool, default=False,
                        help="load saved data or new")
    parser.add_argument("--save", type=bool, default=False, help="save data")
    parser.add_argument("--visualizeModel", type=str, default=False,
                        help="directory to data")
    parser.add_argument("--extra_features", nargs="+", default=[],
                        help="select which features  to add")
    parser.add_argument("--downsample", type=bool, default=False,
                        help="downsample data")
    parser.add_argument("--calculate_geometry", type=bool, default=False,
                        help="decide where to calculate geometry")
    parser.add_argument("--class8", default=False, action="store_true",
                        help="Select 17 classes or 8 classes data")
    parser.add_argument("--RGB_OFF", default=True, action="store_false",
                        help="Select to use RGB or not")
    # TPU-native extensions
    parser.add_argument("--num_devices", type=int, default=None,
                        help="shard blocks over this many devices")
    parser.add_argument("--bf16", default=False, action="store_true",
                        help="bfloat16 matmul activations")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 for multi-host pods")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser.parse_args(argv)


def main(args):
    from tumseg.parallel import initialize_distributed
    from tumseg.utils.cache import enable_compile_cache

    enable_compile_cache()
    initialize_distributed(args.coordinator_address, args.num_processes,
                           args.process_id)
    print(args.class8)
    if args.class8 is False:
        classes, NUM_CLASSES, label2color = class_tables(False)
        class8label = False
    else:
        classes, NUM_CLASSES, label2color = class_tables(True)
        class8label = True
    dataColor = bool(args.RGB_OFF)
    seg_label_to_cat = {i: c for i, c in enumerate(classes)}
    print(seg_label_to_cat)

    root = args.rootdir
    BATCH_SIZE = args.batch_size
    test_file = glob.glob(os.path.join(root, args.test_area)) or \
        glob.glob(root + args.test_area)
    print("Number of Classes = %d" % NUM_CLASSES)

    feature_list = list(args.extra_features)
    if feature_list:
        print("Extra features to be added")
        print(feature_list)
    else:
        print("No extra features")

    experiment_dir = (args.exp_dir if args.exp_dir is not None
                      else "log/sem_seg/") + args.log_dir
    print("Logging Directory = " + str(experiment_dir))
    visual_dir = Path(experiment_dir + "/visual/")
    visual_dir.mkdir(exist_ok=True, parents=True)

    logger, log_string = make_logger("%s/eval.txt" % experiment_dir)
    log_string("PARAMETER ...")
    log_string(args)

    testdatatime = time.time()
    print("start loading test data ...")
    if args.load is False:
        tmp_feature_list = [f for f in feature_list
                            if not (args.calculate_geometry
                                    and f in GEO_FEATURE_NAMES)]
        TEST_DATASET_WHOLE_SCENE = TestGridDataset(
            root=root, las_file_list=test_file, feature_list=tmp_feature_list,
            num_classes=NUM_CLASSES, block_points=args.num_point,
            color=dataColor, class8=args.class8, seed=args.seed)
        if args.calculate_geometry is True:
            attach_geofeatures(TEST_DATASET_WHOLE_SCENE, feature_list,
                               args.downsample)
    else:
        TEST_DATASET_WHOLE_SCENE = TestGridDataset.load_data(saveDir + saveTest)

    log_string("The number of test data is: %d" % len(TEST_DATASET_WHOLE_SCENE))
    TEST_DATASET_WHOLE_SCENE.calculate_labelweights()
    time_print(testdatatime)
    current_time()

    if args.save is True:
        print("Save Test dataset")
        os.makedirs(saveDir, exist_ok=True)
        TEST_DATASET_WHOLE_SCENE.save_data(saveDir + saveTest)

    model = models.get_module(args.model)
    num_extra_features = TEST_DATASET_WHOLE_SCENE.num_extra_features
    print("number = %d" % num_extra_features)

    import jax
    import jax.numpy as jnp

    ckpt_path = str(experiment_dir) + "/checkpoints" + args.output_model
    state = ckpt.load_checkpoint(ckpt_path)
    variables, _, _ = ckpt.restore_variables(state)

    mesh = None
    if args.num_devices and args.num_devices > 1:
        from tumseg.parallel import make_mesh

        mesh = make_mesh(args.num_devices)

    runner = InferenceRunner(
        model, variables, NUM_CLASSES, batch_size=BATCH_SIZE, mesh=mesh,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)

    print("Begin testing")
    out = run_testing(
        TEST_DATASET_WHOLE_SCENE, runner, num_votes=args.num_votes,
        visual_dir=visual_dir, visual=args.visual,
        seg_label_to_cat=seg_label_to_cat, label2color=label2color,
        result_color=True, log_string=log_string)
    print("Done!")
    return out


if __name__ == "__main__":
    args = parse_args()
    start = time.time()
    main(args)
    time_print(start)
    current_time()


def _console_main():
    args = parse_args()
    start = time.time()
    main(args)
    time_print(start)
    current_time()
