classdef Solver < handle
  % caffe.Solver — MATLAB facade over one deepcut_tpu GraphSolver (any of
  % the six update rules, chosen by the solver prototxt). matcaffe API
  % parity: matlab/+caffe/Solver.m.

  properties (Access = private)
    hSolver_self
    attributes
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
      h = varargin{1};
      CHECK(is_valid_handle(h), 'invalid Solver handle');
      self.hSolver_self = h;
      self.attributes = caffe_('solver_get_attr', h);
      self.net = caffe.Net(self.attributes.hNet_net);
      self.test_nets = caffe.Net.empty();
      for k = 1:numel(self.attributes.hNet_test_nets)
        self.test_nets(k) = caffe.Net(self.attributes.hNet_test_nets(k));
      end
    end

    function iter = iter(self)
      iter = caffe_('solver_get_iter', self.hSolver_self);
    end

    function restore(self, snapshot_filename)
      % resume training state from a .solverstate
      CHECK(ischar(snapshot_filename), 'snapshot_filename must be a string');
      CHECK_FILE_EXIST(snapshot_filename);
      caffe_('solver_restore', self.hSolver_self, snapshot_filename);
    end

    function solve(self)
      caffe_('solver_solve', self.hSolver_self);
    end

    function step(self, iters)
      CHECK(isscalar(iters) && iters > 0, 'iters must be positive integer');
      caffe_('solver_step', self.hSolver_self, double(iters));
    end
  end
end
