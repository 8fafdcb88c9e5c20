from devias_tpu.eval.merge import write_result_file, merge_results, softmax_np
from devias_tpu.eval.protocols import (
    final_test,
    validation_one_epoch,
    run_scuba,
    hat_eval,
    count_hat_acc,
)
from devias_tpu.eval.knn import knn_classifier, run_knn_matrix
