"""Generate KITTI train/val split files.

The reference ships chen_split (3712/3769 frames, from 3DOP/Chen et al.),
test_split (random 99%/1%, generator at data/kitti/test_split/new_config.py)
and debug_split (328/50) as txt lists. This tool regenerates equivalent
splits from a KITTI directory:

  python tools/make_splits.py --data_path /data/kitti_obj/training \
      --out splits/test_split --train_ratio 0.99
  python tools/make_splits.py --data_path ... --out splits/debug_split \
      --num_train 328 --num_val 50

The canonical lists are vendored in-repo under splits/ (chen_split
3711/3768, test_split 7397/84, debug_split 328/50 — byte-identical to the
reference's data/kitti/*_split/*.txt data files); this tool only exists to
regenerate custom splits for non-KITTI-standard trees.
"""
import argparse
import os
import random


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_path', required=True,
                        help='KITTI training dir (contains calib/)')
    parser.add_argument('--out', required=True)
    parser.add_argument('--train_ratio', type=float, default=0.99)
    parser.add_argument('--num_train', type=int, default=None)
    parser.add_argument('--num_val', type=int, default=None)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    names = sorted(f[:-4] for f in os.listdir(os.path.join(args.data_path, 'calib'))
                   if f.endswith('.txt'))
    rng = random.Random(args.seed)
    rng.shuffle(names)
    if args.num_train is not None:
        train = sorted(names[:args.num_train])
        val = sorted(names[args.num_train:args.num_train + (args.num_val or 50)])
    else:
        k = int(len(names) * args.train_ratio)
        train = sorted(names[:k])
        val = sorted(names[k:])
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, 'train.txt'), 'w') as f:
        f.write('\n'.join(train) + '\n')
    with open(os.path.join(args.out, 'val.txt'), 'w') as f:
        f.write('\n'.join(val) + '\n')
    print(f'wrote {len(train)} train / {len(val)} val ids to {args.out}')


if __name__ == '__main__':
    main()
