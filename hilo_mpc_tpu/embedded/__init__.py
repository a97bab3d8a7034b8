from .codegen import (compile_shared, condense_lmpc, find_c_compiler,
                      generate_lmpc_c, generate_lqr_c, generate_pid_c,
                      load_lmpc, load_lqr, load_pid, setup_solver)
