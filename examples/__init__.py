# examples for gpmp_tpu (mirror of the reference example suite,
# /root/reference/examples/, rebuilt on the gpmp_tpu API)
