from d2slam_tpu.datasets.euroc import EuRoCDataset
