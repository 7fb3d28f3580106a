classdef Solver < handle
  % caffe.Solver — MATLAB facade over one deepcut_tpu GraphSolver (any of
  % the six update rules, chosen by the solver prototxt). matcaffe API
  % parity: matlab/+caffe/Solver.m.

  properties (Access = private)
    self_id     % gateway handle struct for this solver
  end
  properties (SetAccess = private)
    net
    test_nets
  end

  methods
    function self = Solver(varargin)
      if nargin ~= 1 || ~isstruct(varargin{1})
        % called with a solver prototxt path: defer to the factory
        self = caffe.get_solver(varargin{:});
        return
      end
      solver_id = varargin{1};
      CHECK(is_valid_handle(solver_id), 'invalid Solver handle');
      self.self_id = solver_id;
      % the gateway reports the train net plus zero or more test nets
      nets = caffe_('solver_get_attr', solver_id);
      self.net = caffe.Net(nets.hNet_net);
      self.test_nets = caffe.Net.empty();
      for i = numel(nets.hNet_test_nets):-1:1
        self.test_nets(i) = caffe.Net(nets.hNet_test_nets(i));
      end
    end

    function iter = iter(self)
      iter = caffe_('solver_get_iter', self.self_id);
    end

    function restore(self, snapshot_filename)
      % resume training state from a .solverstate
      CHECK(ischar(snapshot_filename), 'snapshot_filename must be a string');
      CHECK_FILE_EXIST(snapshot_filename);
      caffe_('solver_restore', self.self_id, snapshot_filename);
    end

    function solve(self)
      caffe_('solver_solve', self.self_id);
    end

    function step(self, iters)
      CHECK(isscalar(iters) && iters > 0, 'iters must be positive integer');
      caffe_('solver_step', self.self_id, double(iters));
    end
  end
end
