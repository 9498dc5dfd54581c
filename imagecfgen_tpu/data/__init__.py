from .morphomnist_synth import GroundTruthSCM, synthesize_dataset
from .mnist import load_mnist_arrays
