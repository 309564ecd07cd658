from fetch_engines_ray.corpus.fixtures import *  # noqa: F401,F403
import fetch_engines_ray.corpus.fixtures as _fx
import sys
sys.modules[__name__].__dict__.update({k: v for k, v in _fx.__dict__.items() if k.startswith("F")})
