"""Host-side replay buffer of generated images (utils/misc.py:135-183).

Feeds the discriminator a history of fakes: once full, each incoming image is
returned as-is with p=0.5, or swapped with (and replaced by) a random stored
image with p=0.5. Stays on the host between the two jitted GAN steps; arrays
are numpy to avoid holding device buffers hostage across donations.
"""

from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.rng = np.random.default_rng(seed)
        self.num_imgs = 0
        self.images: list[np.ndarray] = []

    def query(self, images) -> np.ndarray:
        """images: (N, H, W, C) batch of fresh fakes -> batch to feed D."""
        images = np.asarray(images)
        if self.pool_size == 0:
            return images
        out = []
        for image in images:
            if self.num_imgs < self.pool_size:
                self.num_imgs += 1
                self.images.append(image.copy())
                out.append(image)
            elif self.rng.uniform() > 0.5:
                rid = int(self.rng.integers(0, self.pool_size))
                out.append(self.images[rid].copy())
                self.images[rid] = image.copy()
            else:
                out.append(image)
        return np.stack(out)
