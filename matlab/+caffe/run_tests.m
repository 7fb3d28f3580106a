function results = run_tests()
% results = run_tests()
%   Run the matcaffe test suite (net, solver, io) on CPU from a clean
%   gateway state.

caffe.set_mode_cpu();
caffe.reset_all();

results = [ ...
  run(caffe.test.test_net) ...
  run(caffe.test.test_solver) ...
  run(caffe.test.test_io)];

caffe.reset_all();

end
