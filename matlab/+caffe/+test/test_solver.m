classdef test_solver < matlab.unittest.TestCase
  % Solver facade tests (scenario parity with the reference matcaffe
  % suite; same scenarios run MATLAB-free in tests/test_matlab_binding.py).

  properties
    num_output
    solver
  end

  methods
    function self = test_solver()
      self.num_output = 13;
      model_file = caffe.test.test_net.simple_net_file(self.num_output);
      solver_file = tempname();
      fid = fopen(solver_file, 'w');
      fprintf(fid, strjoin({ ...
        sprintf('net: "%s"', model_file), ...
        'test_iter: 10 test_interval: 10 base_lr: 0.01 momentum: 0.9', ...
        'weight_decay: 0.0005 lr_policy: "inv" gamma: 0.0001 power: 0.75', ...
        'display: 100 max_iter: 100 snapshot_after_train: false', ...
        ''}, sprintf('\n')));
      fclose(fid);

      self.solver = caffe.Solver(solver_file);
      caffe.get_solver(solver_file);  % factory path must also work
      caffe.set_mode_cpu();
      % constant-filler label tops persist whatever we stage into them
      for n = [self.solver.net, self.solver.test_nets(1)]
        n.blobs('label').set_data(randi( ...
          self.num_output - 1, n.blobs('label').shape));
      end
      delete(solver_file);
      delete(model_file);
    end
  end

  methods (Test)
    function test_solve(self)
      self.verifyEqual(self.solver.iter(), 0)
      self.solver.step(30);
      self.verifyEqual(self.solver.iter(), 30)
      self.solver.solve()
      self.verifyEqual(self.solver.iter(), 100)
    end
  end
end
