from .audio_mnist import AudioMNISTData, VALIDATION_RUNS
from .esrf import EsrfStation
from .mnist import load_mnist_arrays
from .morphomnist_synth import GroundTruthSCM, synthesize_dataset
from .synthetic_digits import synthetic_digits
from .whalecalls import WhaleCallData
