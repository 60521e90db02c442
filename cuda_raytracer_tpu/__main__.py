import sys

from cuda_raytracer_tpu.cli import main

sys.exit(main())
