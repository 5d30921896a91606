from .gauss_newton import BAConfig, bundle_adjust
