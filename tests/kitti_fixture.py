"""Synthetic mini-KITTI tree for data-layer and evaluator tests."""
import os

import numpy as np
from PIL import Image

P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 172.854, 0.2163791],
    [0.0, 0.0, 1.0, 0.002745884],
], np.float64)
P3 = P2.copy()
P3[0, 3] = -339.5242  # right camera: tx = -fx * baseline + small offset

R0 = np.eye(3)
TR = np.array([
    [7.533745e-03, -9.999714e-01, -6.166020e-04, -4.069766e-03],
    [1.480249e-02, 7.280733e-04, -9.998902e-01, -7.631618e-02],
    [9.998621e-01, 7.523790e-03, 1.480755e-02, -2.717806e-01],
])

IMAGE_HW = (370, 1224)


def _calib_text():
    def row(name, mat):
        return name + ': ' + ' '.join(f'{v:.12e}' for v in np.asarray(mat).reshape(-1))
    lines = [
        row('P0', P2), row('P1', P2), row('P2', P2), row('P3', P3),
        row('R0_rect', R0), row('Tr_velo_to_cam', TR), row('Tr_imu_to_velo', TR),
    ]
    return '\n'.join(lines) + '\n'


def _project(x, y, z):
    p = P2 @ np.array([x, y, z, 1.0])
    return p[0] / p[2], p[1] / p[2]


def make_car_label(x, y, z, ry=0.1, h=1.5, w=1.6, l=3.9):
    """A Car whose 2D box is derived by projecting the 3D box center/size."""
    cx, cy = _project(x, y - h / 2, z)
    half_w_px = (l * 0.7) / z * P2[0, 0] / 2
    half_h_px = h / z * P2[1, 1] / 2
    x1, y1 = cx - half_w_px, cy - half_h_px
    x2, y2 = cx + half_w_px, cy + half_h_px
    alpha = ry - np.arctan2(x, z)
    return (f'Car 0.00 0 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} '
            f'{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}')


FRAME_OBJECTS = {
    0: [(2.0, 1.6, 12.0), (-3.0, 1.7, 20.0)],
    1: [(0.5, 1.6, 15.0)],
    2: [(4.0, 1.65, 25.0), (-2.0, 1.55, 9.0), (1.0, 1.6, 35.0)],
    3: [],
}


def build_mini_kitti(root: str, n_frames: int = 4, seed: int = 0) -> str:
    """Create root/{calib,image_2,image_3,label_2,velodyne}/00000*.{txt,png,bin}."""
    rng = np.random.default_rng(seed)
    for sub in ('calib', 'image_2', 'image_3', 'label_2', 'velodyne'):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n_frames):
        name = '%06d' % i
        with open(os.path.join(root, 'calib', name + '.txt'), 'w') as f:
            f.write(_calib_text())
        img = rng.integers(0, 255, (*IMAGE_HW, 3), np.uint8)
        Image.fromarray(img).save(os.path.join(root, 'image_2', name + '.png'))
        Image.fromarray(img).save(os.path.join(root, 'image_3', name + '.png'))
        objs = FRAME_OBJECTS.get(i, [])
        with open(os.path.join(root, 'label_2', name + '.txt'), 'w') as f:
            f.write('\n'.join(make_car_label(*o) for o in objs))
            if objs:
                f.write('\n')
        # a handful of lidar points in front of the car positions
        pts = rng.uniform([3, -10, -2, 0], [40, 10, 1, 1], size=(256, 4)).astype(np.float32)
        pts.tofile(os.path.join(root, 'velodyne', name + '.bin'))
    return root


def write_split_files(root: str, out_dir: str, train_ids, val_ids):
    os.makedirs(out_dir, exist_ok=True)
    train = os.path.join(out_dir, 'train.txt')
    val = os.path.join(out_dir, 'val.txt')
    with open(train, 'w') as f:
        f.write('\n'.join('%06d' % i for i in train_ids) + '\n')
    with open(val, 'w') as f:
        f.write('\n'.join('%06d' % i for i in val_ids) + '\n')
    return train, val
