"""Native (C++) sources shipped inside the package.

``tile_loader.cpp`` is the multithreaded TIFF pair decoder; it ships as
package data so ``pip install crosstalk-tpu`` gets the fast decode path,
not just a repo checkout (the round-3 packaged install silently fell back
to the ~48x-slower Python decoder). The ctypes binding that builds and
loads it lives in crosstalk_tpu/data/native_loader.py.
"""

import os

SOURCE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tile_loader.cpp")
